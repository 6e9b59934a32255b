"""Geometry primitives vs numpy oracles (SURVEY.md §7.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from altair_tpu.core.geometry import (
    Vec3,
    detector_position,
    detector_position_aimed,
    in_port_cap,
    line_hits_disk,
    orthonormal_basis,
    ray_box_exit_t,
    ray_sphere_exit_t,
    sphere_hit,
)

RNG = np.random.default_rng(42)


def _rand_unit(n):
    v = RNG.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _vec(a):
    return Vec3(jnp.asarray(a[..., 0], jnp.float32),
                jnp.asarray(a[..., 1], jnp.float32),
                jnp.asarray(a[..., 2], jnp.float32))


class TestVec3:
    def test_algebra(self):
        a = _vec(RNG.normal(size=(16, 3)))
        b = _vec(RNG.normal(size=(16, 3)))
        np.testing.assert_allclose(
            np.asarray((a + b).stack()),
            np.asarray(a.stack()) + np.asarray(b.stack()), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a.dot(b)),
            np.sum(np.asarray(a.stack()) * np.asarray(b.stack()), -1),
            rtol=1e-5)
        c = a.cross(b)
        np.testing.assert_allclose(
            np.asarray(c.stack()),
            np.cross(np.asarray(a.stack()), np.asarray(b.stack())),
            rtol=1e-4, atol=1e-5)

    def test_normalized(self):
        a = _vec(RNG.normal(size=(64, 3)) * 10)
        n = a.normalized()
        np.testing.assert_allclose(np.asarray(n.norm()), 1.0, atol=1e-5)


class TestOrthonormalBasis:
    def test_orthogonality_everywhere(self):
        # include poles and near-poles (the branchless construction's
        # historical failure points)
        dirs = np.concatenate([
            _rand_unit(128),
            [[0, 0, 1], [0, 0, -1], [1e-8, 0, 1], [0, 1e-8, -1]],
        ]).astype(np.float32)
        n = _vec(dirs)
        u, v = orthonormal_basis(n)
        for a, b in [(u, v), (u, n), (v, n)]:
            np.testing.assert_allclose(np.asarray(a.dot(b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(u.norm()), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v.norm()), 1.0, atol=1e-5)


class TestRaySphere:
    def test_interior_point_hits_sphere(self):
        r = 100.1
        p = RNG.uniform(-50, 50, size=(256, 3))
        d = _rand_unit(256)
        t = np.asarray(ray_sphere_exit_t(_vec(p), _vec(d), r))
        q = p + t[:, None] * d
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), r, rtol=1e-5)
        assert (t > 0).all()

    def test_on_sphere_departing_inward(self):
        r = 100.1
        q0 = _rand_unit(256) * r
        # inward cosine-weighted-ish directions
        d = _rand_unit(256)
        inward = (d * q0).sum(1) < 0
        d[~inward] *= -1
        q1 = np.asarray(sphere_hit(_vec(q0), _vec(d), r).stack())
        np.testing.assert_allclose(np.linalg.norm(q1, axis=1), r, rtol=1e-5)
        # the chord length is 2 r |cos| of the angle to the normal
        t_expect = -2 * (d * q0).sum(1)
        t = np.asarray(ray_sphere_exit_t(_vec(q0), _vec(d), r))
        np.testing.assert_allclose(t, np.abs(t_expect), rtol=1e-3, atol=1e-2)

    def test_reference_source_first_hit(self):
        # source (-60, 0, -80), dir (5,0,0): analytic first hit at
        # x = sqrt(100.1^2 - 80^2)  (fluxAtObserver.C:193-201 geometry)
        p = _vec(np.array([[-60.0, 0.0, -80.0]]))
        d = _vec(np.array([[1.0, 0.0, 0.0]]))
        q = sphere_hit(p, d, 100.1)
        assert np.isclose(float(q.x[0]), np.sqrt(100.1**2 - 80**2), rtol=1e-5)
        assert np.isclose(float(q.z[0]), -80.0, atol=1e-4)


class TestPortCap:
    def test_cap_test_matches_polar_angle(self):
        r = 100.1
        theta_max = np.deg2rad(170.0)
        q = _rand_unit(512) * r
        polar = np.arccos(np.clip(q[:, 2] / r, -1, 1))
        expect = polar > theta_max
        got = np.asarray(in_port_cap(_vec(q), r, theta_max))
        # boundary points may flip either way in fp32; exclude a hairline
        margin = np.abs(polar - theta_max) > 1e-4
        assert (got[margin] == expect[margin]).all()


class TestBoxExit:
    def test_exit_on_box_surface(self):
        half = 300.0
        p = RNG.uniform(-90, 90, size=(256, 3))
        d = _rand_unit(256)
        t = np.asarray(ray_box_exit_t(_vec(p), _vec(d), half))
        q = p + t[:, None] * d
        np.testing.assert_allclose(np.abs(q).max(axis=1), half, rtol=1e-5)

    def test_axis_aligned(self):
        t = float(ray_box_exit_t(
            _vec(np.array([[10.0, 0, 0]])), _vec(np.array([[1.0, 0, 0]])),
            300.0)[0])
        assert np.isclose(t, 290.0)


class TestDetectorPlacement:
    def test_position_on_sphere_about_port(self):
        c, n = detector_position(jnp.float32(30.0), jnp.float32(45.0), 100.0)
        cx, cy, cz = float(c.x), float(c.y), float(c.z)
        # distance from port centre (0,0,-100) is the placement radius
        assert np.isclose(np.hypot(np.hypot(cx, cy), cz + 100.0), 100.0,
                          rtol=1e-6)
        # on-axis: theta=0 puts it straight below the port
        c0, _ = detector_position(jnp.float32(0.0), jnp.float32(0.0), 100.0)
        assert np.isclose(float(c0.z), -200.0, rtol=1e-6)

    def test_reference_normal_quirk(self):
        """setPosition stores (-dy, dx, dz)/|d| (fluxAtObserver.C:65-67) —
        NOT the aim-at-port vector. Pin the quirk exactly."""
        theta, phi = 45.0, 0.0
        c, n = detector_position(jnp.float32(theta), jnp.float32(phi), 100.0)
        d = np.array([float(c.x), float(c.y), float(c.z) + 100.0])
        d /= np.linalg.norm(d)
        np.testing.assert_allclose(
            [float(n.x), float(n.y), float(n.z)],
            [-d[1], d[0], d[2]], atol=1e-6)
        assert np.isclose(float(n.norm()), 1.0, atol=1e-6)

    def test_aimed_normal_points_at_port(self):
        c, n = detector_position_aimed(jnp.float32(30.0), jnp.float32(120.0),
                                       100.0)
        to_port = np.array([0 - float(c.x), 0 - float(c.y),
                            -100.0 - float(c.z)])
        to_port /= np.linalg.norm(to_port)
        np.testing.assert_allclose(
            [float(n.x), float(n.y), float(n.z)], to_port, atol=1e-6)


class TestDiskTest:
    def test_direct_hit(self):
        center = _vec(np.array([[0.0, 0.0, -200.0]]))
        normal = _vec(np.array([[0.0, 0.0, 1.0]]))
        p = _vec(np.array([[5.0, 0.0, -100.0]]))
        d = _vec(np.array([[0.0, 0.0, -1.0]]))
        assert bool(line_hits_disk(p, d, center, normal, 20.0)[0])
        assert not bool(line_hits_disk(p, d, center, normal, 4.0)[0])

    def test_parallel_excluded(self):
        center = _vec(np.array([[0.0, 0.0, -200.0]]))
        normal = _vec(np.array([[0.0, 0.0, 1.0]]))
        p = _vec(np.array([[0.0, 0.0, -200.0]]))  # in plane!
        d = _vec(np.array([[1.0, 0.0, 0.0]]))     # parallel to plane
        assert not bool(line_hits_disk(p, d, center, normal, 20.0)[0])

    def test_backward_intersection_counts(self):
        """The reference intersects the infinite LINE (no t>=0 check,
        fluxAtObserver.C:86-91) — a behind-the-ray plane crossing counts."""
        center = _vec(np.array([[0.0, 0.0, 100.0]]))  # behind the ray
        normal = _vec(np.array([[0.0, 0.0, 1.0]]))
        p = _vec(np.array([[0.0, 0.0, -100.0]]))
        d = _vec(np.array([[0.0, 0.0, -1.0]]))  # heading away
        assert bool(line_hits_disk(p, d, center, normal, 20.0)[0])

    def test_oblique_oracle(self):
        # random oblique configurations vs a numpy implementation
        n = 64
        centers = RNG.uniform(-50, 50, (n, 3))
        normals = _rand_unit(n)
        points = RNG.uniform(-50, 50, (n, 3))
        dirs = _rand_unit(n)
        radius = 10.0
        got = np.asarray(line_hits_disk(
            _vec(points), _vec(dirs), _vec(centers), _vec(normals), radius))
        dot = (dirs * normals).sum(1)
        t = -((points - centers) * normals).sum(1) / dot
        hp = points + t[:, None] * dirs
        r2 = np.linalg.norm(np.cross(normals, hp - centers), axis=1) ** 2
        expect = (np.abs(dot) >= 1e-10) & (r2 <= radius**2)
        # exclude hairline cases near the rim
        margin = np.abs(np.sqrt(r2) - radius) > 1e-3
        assert (got[margin] == expect[margin]).all()
