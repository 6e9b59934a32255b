"""Scatter-law samplers vs their closed-form distributions (SURVEY.md §7.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from altair_tpu.config import SphereScene, SurfaceModel
from altair_tpu.core.geometry import Vec3
from altair_tpu.core.sampling import (
    cos_n_lobe,
    cosine_hemisphere,
    gaussian_tilt,
    mixed_brdf,
    rough_normal,
    scatter,
    specular_reflect,
    specular_rough,
)

N = 200_000


def _normals(n, xyz=(0.0, 0.0, 1.0)):
    return Vec3.full((n,), xyz)


class TestCosineHemisphere:
    def test_cos_theta_distribution(self):
        """cos(theta) ~ sqrt(U) => cos^2(theta) ~ U(0,1)."""
        d = cosine_hemisphere(jax.random.key(0), _normals(N))
        cos2 = np.asarray(d.z) ** 2
        assert (np.asarray(d.z) > 0).all()
        ks = stats.kstest(cos2, "uniform")
        assert ks.pvalue > 1e-3, ks

    def test_azimuth_uniform(self):
        d = cosine_hemisphere(jax.random.key(1), _normals(N))
        phi = np.arctan2(np.asarray(d.y), np.asarray(d.x))
        ks = stats.kstest((phi + np.pi) / (2 * np.pi), "uniform")
        assert ks.pvalue > 1e-3, ks

    def test_arbitrary_normal(self):
        n = Vec3.full((N,), (1 / np.sqrt(3),) * 3)
        d = cosine_hemisphere(jax.random.key(2), n)
        cos_t = np.asarray(d.dot(n))
        assert (cos_t > 0).all()
        ks = stats.kstest(cos_t**2, "uniform")
        assert ks.pvalue > 1e-3, ks


class TestSpecular:
    def test_mirror_law(self):
        inc = Vec3.full((4,), (0.6, 0.0, -0.8))
        n = _normals(4)
        r = specular_reflect(inc, n)
        np.testing.assert_allclose(np.asarray(r.stack()),
                                   [[0.6, 0.0, 0.8]] * 4, atol=1e-6)

    def test_rough_specular_angle_spread(self):
        sigma = 0.05
        inc = Vec3.full((N,), (0.6, 0.0, -0.8))
        n = _normals(N)
        out = specular_rough(jax.random.key(3), inc, n, jnp.float32(sigma))
        mirror = np.array([0.6, 0.0, 0.8])
        cos_dev = np.clip(np.asarray(out.stack()) @ mirror, -1, 1)
        dev = np.arccos(cos_dev)
        # normal tilted by theta ~ N(0, sigma) at uniform azimuth =>
        # reflected dir deviates by up to 2|theta|; empirically the mean
        # deviation is ~1.4 sigma (E|N| = 0.8 sigma times the ~1.8 azimuth
        # average factor)
        assert 1.1 * sigma < dev.mean() < 1.9 * sigma

    def test_zero_roughness_is_mirror(self):
        inc = Vec3.full((128,), (0.6, 0.0, -0.8))
        out = specular_rough(jax.random.key(4), inc, _normals(128),
                             jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out.stack()),
                                   [[0.6, 0.0, 0.8]] * 128, atol=1e-5)


class TestGaussianTilt:
    def test_tilt_angle_distribution(self):
        base = Vec3.full((N,), (0.0, 0.0, 1.0))
        sigma = 0.1
        out = gaussian_tilt(jax.random.key(5), base, jnp.float32(sigma))
        # reference construction: out = z + sin(theta)(...) renormalised;
        # angular deviation = atan(|sin theta|) ~ |N(0, sigma)| for small sigma
        dev = np.arccos(np.clip(np.asarray(out.z), -1, 1))
        expect = np.abs(sigma * np.random.default_rng(0).normal(size=N))
        expect = np.arctan(np.abs(np.sin(expect)))
        assert np.isclose(dev.mean(), expect.mean(), rtol=0.05)


class TestMixedBRDF:
    def test_specular_diffuse_split(self):
        """gBRDF(0.3, 0.4, 0.6): 40% specular about the mirror direction,
        60% cosine diffuse (nonLambertianFlux.C:211,162-169)."""
        inc = Vec3.full((N,), (0.6, 0.0, -0.8))
        n = _normals(N)
        out = mixed_brdf(jax.random.key(6), inc, n,
                         jnp.float32(0.4), jnp.float32(0.6),
                         jnp.float32(0.3))
        mirror = np.array([0.6, 0.0, 0.8])
        cos_mirror = np.asarray(out.stack()) @ mirror
        cone = np.cos(np.deg2rad(30))  # ~3.3 sigma of the 9-deg lobe
        in_lobe = (cos_mirror > cone).mean()
        # diffuse leakage into the same cone, measured from the pure sampler
        diff = cosine_hemisphere(jax.random.key(60), n)
        leak = (np.asarray(diff.stack()) @ mirror > cone).mean()
        spec_est = in_lobe - 0.6 * leak
        assert abs(spec_est - 0.4) < 0.02, (in_lobe, leak)


class TestCosNLobe:
    def test_density_matches_rejection_target(self):
        """theta density ∝ cos^n(theta) on [0, max_angle] (uniform-theta
        proposal, nonLambertianFlux copy.C:38-71)."""
        n_exp, max_ang = 2.0, np.deg2rad(60.0)
        out = cos_n_lobe(jax.random.key(7), _normals(N), jnp.float32(n_exp),
                         jnp.float32(max_ang))
        theta = np.arccos(np.clip(np.asarray(out.z), -1, 1))
        assert theta.max() <= max_ang + 1e-3

        def cdf(t):
            # normalised integral of cos^2 on [0, t]
            num = t / 2 + np.sin(2 * t) / 4
            den = max_ang / 2 + np.sin(2 * max_ang) / 4
            return num / den

        ks = stats.kstest(theta, cdf)
        assert ks.pvalue > 1e-3, ks


class TestScatterDispatch:
    def test_all_models_return_unit_inward(self):
        scene = SphereScene()
        inc = Vec3.full((1024,), (0.0, 0.6, -0.8))
        n = _normals(1024)
        for model in SurfaceModel:
            out = scatter(jax.random.key(8), model, inc, n, scene)
            assert np.allclose(np.asarray(out.norm()), 1.0, atol=1e-5), model
            assert (np.asarray(out.dot(n)) >= -1e-6).all(), model

    def test_custom_callable_hook(self):
        """User-pluggable BRDF (the archived Reflection() override as a pure
        function)."""
        def fixed_up(key, incident, normal, scene):
            return Vec3.full(normal.x.shape, (0.0, 0.0, 1.0))

        out = scatter(jax.random.key(9), fixed_up,
                      Vec3.full((8,), (1.0, 0.0, 0.0)), _normals(8),
                      SphereScene())
        np.testing.assert_allclose(np.asarray(out.z), 1.0)
