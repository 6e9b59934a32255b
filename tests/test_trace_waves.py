"""Wave-compaction tracer vs the plain kernel (distributional parity)."""

import jax
import numpy as np
import pytest

from altair_tpu import SCENE_OPTIMIZE, SOURCE_OVERNIGHT
from altair_tpu.core.trace import EXITED, trace_rays
from altair_tpu.core.trace_waves import trace_rays_waves

SCENE = SCENE_OPTIMIZE.with_(max_bounces=2048)
N = 65536


@pytest.fixture(scope="module")
def wave_result():
    res, ovf = jax.jit(
        lambda k: trace_rays_waves(k, SCENE, SOURCE_OVERNIGHT, N,
                                   min_wave=4096))(jax.random.key(0))
    return res, int(ovf)


class TestWaves:
    def test_no_overflow(self, wave_result):
        _, ovf = wave_result
        assert ovf == 0

    def test_exit_fraction(self, wave_result):
        res, _ = wave_result
        st = np.asarray(res.status)
        z = np.asarray(res.last_point.z)
        frac = ((st == EXITED) & (z < -100)).mean()
        assert abs(frac - 0.427) < 0.010

    def test_all_terminated_and_geometry(self, wave_result):
        res, _ = wave_result
        st = np.asarray(res.status)
        assert ((st == 1) | (st == 2)).all()
        ab = np.asarray(res.last_point.stack())[st == 2]
        r = np.linalg.norm(ab, axis=1)
        assert (r > 100.1 - 0.02).all() and (r < 101.0 + 0.02).all()

    def test_segment_consistency(self, wave_result):
        res, _ = wave_result
        st = np.asarray(res.status)
        a = np.asarray(res.seg_start.stack())[st == 1]
        b = np.asarray(res.last_point.stack())[st == 1]
        d = np.asarray(res.direction.stack())[st == 1]
        seg = b - a
        ln = np.linalg.norm(seg, axis=1)
        ok = ln > 1e-3
        cos = (seg[ok] * d[ok]).sum(1) / ln[ok]
        assert cos.min() > 1 - 1e-4

    def test_short_first_wave_equivalent(self):
        # first_wave_iters compacts a LOW-OCCUPANCY entry state early (the
        # rim-continuation schedule knob: its clip buffer enters ~1/2.8
        # occupied).  Synthetic from-state batch with 30% live lanes:
        # physics must stay distribution-equal to the default schedule and
        # nothing may be lost as overflow with shrink sized for the early
        # compaction (0.3 * N alive << N/2 capacity).
        import jax.numpy as jnp

        from altair_tpu.core.trace import ABSORBED, RUNNING
        from altair_tpu.core.trace_waves import trace_waves_from_state
        from altair_tpu.core.geometry import Vec3

        shape = (N,)
        src = SOURCE_OVERNIGHT
        pos = Vec3(*(jnp.full(shape, v, jnp.float32)
                     for v in (src.x, src.y, src.z)))
        d = Vec3(*(jnp.full(shape, v, jnp.float32)
                   for v in (src.dir_x, src.dir_y, src.dir_z))).normalized()
        live = (jnp.arange(N) % 10) < 3
        status = jnp.where(live, RUNNING, ABSORBED).astype(jnp.int32)
        state = (pos, d, pos, status, jnp.zeros(shape, jnp.int32),
                 jnp.zeros(shape, bool))

        def run(first, shrink):
            return jax.jit(lambda k: trace_waves_from_state(
                k, SCENE, state, wave_iters=96, shrink=shrink,
                min_wave=4096, first_wave_iters=first))(jax.random.key(3))

        res_a, ovf_a = run(None, 4)
        res_b, ovf_b = run(8, 2)
        assert int(ovf_a) == 0 and int(ovf_b) == 0
        m = np.asarray(live)
        n_live = int(m.sum())
        for res in (res_a, res_b):
            st = np.asarray(res.status)[m]
            assert ((st == 1) | (st == 2)).all()
        def frac(res):
            st = np.asarray(res.status)[m]
            z = np.asarray(res.last_point.z)[m]
            return ((st == 1) & (z < -100)).mean()
        sigma = np.sqrt(0.427 * 0.573 / n_live) * np.sqrt(2)
        assert abs(frac(res_a) - frac(res_b)) < 4 * sigma
        ba = float(np.asarray(res_a.n_bounces)[m].mean())
        bb = float(np.asarray(res_b.n_bounces)[m].mean())
        assert abs(ba - bb) < 2.5, (ba, bb)

    def test_matches_plain_kernel_distribution(self, wave_result):
        res, _ = wave_result
        plain = trace_rays(jax.random.key(9), SCENE, SOURCE_OVERNIGHT, N)
        for r in (res, plain):
            pass
        bw = float(np.asarray(res.n_bounces).mean())
        bp = float(np.asarray(plain.n_bounces).mean())
        assert abs(bw - bp) < 1.5
        # exit-direction z-moment agreement
        stw = np.asarray(res.status)
        stp = np.asarray(plain.status)
        dzw = np.asarray(res.direction.z)[stw == 1].mean()
        dzp = np.asarray(plain.direction.z)[stp == 1].mean()
        assert abs(dzw - dzp) < 0.01
