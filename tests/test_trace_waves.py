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
