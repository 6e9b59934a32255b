"""Trace-kernel behaviour + physics-parity invariants (SURVEY.md §4).

The exit-fraction oracles come from the reference corpus footers
(``# Total rays exiting port``, BASELINE.md): port 160deg -> ~74.8%,
164deg -> ~65.5%, 170deg -> ~42.5% of rays exit with reflectance 0.99,
matching the analytic p_port / (p_port + (1 - rho)) with
p_port = (1 - cos(180 - port_angle)) / 2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altair_tpu import (
    SCENE_OPTIMIZE,
    SCENE_V1,
    SOURCE_OVERNIGHT,
    SOURCE_V1,
    Source,
    SphereScene,
    TraceConfig,
)
from altair_tpu.core.trace import (
    ABSORBED,
    EXITED,
    SUSPENDED,
    exit_count,
    trace_rays,
    trace_rays_jit,
)

N = 20_000
SCENE = SCENE_OPTIMIZE.with_(max_bounces=4096)


@pytest.fixture(scope="module")
def result():
    return trace_rays_jit(jax.random.key(0), SCENE, SOURCE_OVERNIGHT, N)


def analytic_exit_fraction(port_angle_deg, rho):
    p_port = (1 - np.cos(np.deg2rad(180 - port_angle_deg))) / 2
    return p_port / (p_port + (1 - rho))


class TestStatuses:
    def test_all_rays_terminate(self, result):
        st = np.asarray(result.status)
        assert ((st == EXITED) | (st == ABSORBED)).all()

    def test_exit_points_beyond_port(self, result):
        st = np.asarray(result.status)
        z = np.asarray(result.last_point.z)
        # geometric exits land on the world box; (almost) all pass the
        # reference's z < -100 test (grazing sideways escapes are the
        # measure-zero exception, fluxAtObserver.C:162-166)
        assert (z[st == EXITED] < -98.0).all()
        frac_ztest = (z[st == EXITED] < -100.0).mean()
        assert frac_ztest > 0.999

    def test_absorbed_on_shell(self, result):
        st = np.asarray(result.status)
        p = np.asarray(result.last_point.stack())
        r = np.linalg.norm(p[st == ABSORBED], axis=1)
        # wall absorptions at r = 100.1; rim-face absorptions (exact_rim)
        # anywhere in the shell band [100.1, 101]
        assert (r > 100.1 - 0.02).all() and (r < 101.0 + 0.02).all()
        # the vast majority are ordinary wall absorptions
        assert (np.abs(r - 100.1) < 0.01).mean() > 0.95

    def test_final_segment_consistent(self, result):
        """direction == normalize(last_point - seg_start) — the RayEndpoint
        contract (fluxAtObserverFast.C:1164-1247)."""
        st = np.asarray(result.status)
        a = np.asarray(result.seg_start.stack())
        b = np.asarray(result.last_point.stack())
        d = np.asarray(result.direction.stack())
        seg = b - a
        ln = np.linalg.norm(seg, axis=1)
        ok = (st == EXITED) & (ln > 1e-3)
        cos = (seg[ok] * d[ok]).sum(1) / ln[ok]
        assert cos.min() > 1 - 1e-4


class TestExitFractions:
    @pytest.mark.parametrize("port,corpus", [
        (160.0, 0.748), (164.0, 0.655), (170.0, 0.425),
    ])
    def test_corpus_parity(self, port, corpus):
        scene = SCENE.with_(theta_max_deg=port)
        res = trace_rays_jit(jax.random.key(7), scene, SOURCE_OVERNIGHT, N)
        frac = float(exit_count(res)) / N
        # 3 MC sigmas of 20k rays ~ 0.010; corpus spread itself is ~0.005
        assert abs(frac - corpus) < 0.012, (port, frac)

    def test_analytic_model(self):
        for port in (162.0, 175.0):
            scene = SCENE.with_(theta_max_deg=port)
            res = trace_rays_jit(jax.random.key(8), scene, SOURCE_OVERNIGHT, N)
            frac = float(exit_count(res)) / N
            assert abs(frac - analytic_exit_fraction(port, 0.99)) < 0.015

    def test_perfect_reflectance_all_exit(self):
        """SCENE_V1 (fluxAtObserver.C: no SetReflectance => rho = 1):
        every ray eventually escapes."""
        scene = SCENE_V1.with_(max_bounces=8192)
        res = trace_rays_jit(jax.random.key(9), scene, SOURCE_V1, 5_000)
        assert float(exit_count(res)) / 5_000 > 0.999


class TestBounceStatistics:
    def test_mean_bounce_count(self, result):
        """Geometric lifetime: mean bounces ~ 1/(p_port + (1-rho)) ~ 57
        for port 170, rho 0.99."""
        mean = float(np.asarray(result.n_bounces).mean())
        assert 50 < mean < 65, mean

    def test_suspension_guard(self):
        scene = SCENE.with_(max_bounces=4)
        res = trace_rays_jit(jax.random.key(1), scene, SOURCE_OVERNIGHT, 2000)
        st = np.asarray(res.status)
        assert (st == SUSPENDED).sum() > 0
        assert (np.asarray(res.n_bounces) <= 4).all()


class TestDeterminism:
    def test_same_key_same_result(self):
        r1 = trace_rays_jit(jax.random.key(5), SCENE, SOURCE_OVERNIGHT, 1000)
        r2 = trace_rays_jit(jax.random.key(5), SCENE, SOURCE_OVERNIGHT, 1000)
        np.testing.assert_array_equal(np.asarray(r1.status),
                                      np.asarray(r2.status))
        np.testing.assert_array_equal(np.asarray(r1.last_point.stack()),
                                      np.asarray(r2.last_point.stack()))

    def test_different_keys_differ(self):
        r1 = trace_rays_jit(jax.random.key(5), SCENE, SOURCE_OVERNIGHT, 1000)
        r2 = trace_rays_jit(jax.random.key(6), SCENE, SOURCE_OVERNIGHT, 1000)
        assert (np.asarray(r1.status) != np.asarray(r2.status)).any()


class TestLambertianExitLaw:
    def test_exit_cosine_profile(self):
        """A Lambertian sphere port must emit cos(theta) — the reference's
        in-simulation self-check (distributionSphereDetectorSweep.C:115-118).
        Validated on the z-direction cosine of exiting rays: for a
        Lambertian-emitting port the -dz distribution is ~ 2x cos weighted.
        We check the angular histogram fits a*cos(theta) with good R^2 in
        the score tests; here just sanity-bound the mean."""
        res = trace_rays_jit(jax.random.key(2), SCENE, SOURCE_OVERNIGHT, N)
        st = np.asarray(res.status)
        dz = np.asarray(res.direction.normalized().z)[st == EXITED]
        assert dz.max() < 0  # exits head downward (-z)
        # E[-dz] for cos-weighted hemisphere = 2/3
        assert abs((-dz).mean() - 2 / 3) < 0.02


class TestHistory:
    def test_history_records_path(self):
        cfg = TraceConfig(keep_history=64)
        res = trace_rays_jit(jax.random.key(3), SCENE, SOURCE_OVERNIGHT, 16,
                             cfg)
        assert res.history is not None
        hlen = np.asarray(res.history_len)
        hist = np.asarray(res.history)  # [K, N, 3]
        assert (hlen >= 2).all()
        # first point is the source
        np.testing.assert_allclose(hist[0, :, 0], -60.0, atol=1e-4)
        # intermediate points lie on the shell
        for ray in range(16):
            k = min(int(hlen[ray]), 64)
            pts = hist[1:k - 1, ray]
            if len(pts):
                np.testing.assert_allclose(
                    np.linalg.norm(pts, axis=1), 100.1, rtol=1e-3)


class TestValidation:
    def test_exterior_source_rejected(self):
        from altair_tpu.config import validate
        with pytest.raises(ValueError, match="outside the sphere"):
            validate(SCENE, Source(x=-150.0))

    def test_zero_direction_rejected(self):
        from altair_tpu.config import validate
        with pytest.raises(ValueError, match="non-zero"):
            validate(SCENE, Source(dir_x=0.0, dir_y=0.0, dir_z=0.0))

    def test_bad_port_angle_rejected(self):
        from altair_tpu.config import validate
        with pytest.raises(ValueError, match="theta_max"):
            validate(SCENE.with_(theta_max_deg=45.0), SOURCE_V1)

    def test_valid_passes(self):
        from altair_tpu.config import validate
        validate(SCENE, SOURCE_V1)
