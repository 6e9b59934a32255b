"""On-real-TPU Pallas kernel pins (VERDICT r2 #5) — OPT-IN.

The CPU suite validates the Mosaic kernel code through the Pallas TPU
interpreter (``test_pallas.py``, software RNG); this module validates the
COMPILED kernels with the hardware PRNG on the real chip — closing the
gap between "compiles and traces" and "verified on hardware" for the
highest-risk code in the repo (``core/trace_pallas.py``).

Run explicitly against the tunnel device (these tests are skipped under
the default CPU-forced conftest):

    ALTAIR_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_hardware.py -q

Expect the remote-compile tax (~2-10 min per program) on first run; the
persistent jit cache makes reruns fast.  Do NOT run other TPU jobs
concurrently (tunnel users wedge each other — see
.claude/skills/verify/SKILL.md).
"""

import numpy as np
import pytest

import jax

from altair_tpu import SCENE_OPTIMIZE, SOURCE_OVERNIGHT, TraceConfig


def _on_tpu() -> bool:
    d = jax.devices()[0]
    return d.platform == "tpu" or "TPU" in d.device_kind


pytestmark = pytest.mark.skipif(
    not _on_tpu(),
    reason="on-hardware Pallas pins; run with ALTAIR_TEST_PLATFORM=tpu "
           "against a real TPU",
)

# simple-mode scene for the raw kernels (the rim post-pass is XLA code
# validated elsewhere); bounce cap 4096 is exact in practice for rho=0.99
SCENE = SCENE_OPTIMIZE.with_(max_bounces=4096, exact_rim=False)
CFG = TraceConfig()
N = 131_072  # 8 VMEM blocks; large enough for tight statistical bands


@pytest.fixture(scope="module")
def xla_result():
    from altair_tpu.core.trace import trace_rays

    return jax.block_until_ready(
        jax.jit(lambda k: trace_rays(k, SCENE, SOURCE_OVERNIGHT, N, CFG))(
            jax.random.key(1)))


@pytest.fixture(scope="module")
def block_result():
    from altair_tpu.core.trace_pallas import trace_rays_pallas

    return jax.block_until_ready(
        jax.jit(lambda k: trace_rays_pallas(k, SCENE, SOURCE_OVERNIGHT, N,
                                            CFG))(jax.random.key(2)))


@pytest.fixture(scope="module")
def refill_result():
    from altair_tpu.core.trace_pallas import trace_rays_refill

    return jax.block_until_ready(
        jax.jit(lambda k: trace_rays_refill(k, SCENE, SOURCE_OVERNIGHT, N,
                                            CFG))(jax.random.key(3)))


def _exit_frac(res):
    return int(np.asarray(res.exited_port_mask(SCENE.exit_port_z)).sum()) / N


def _exit_dirs_z(res):
    m = np.asarray(res.exited_port_mask(SCENE.exit_port_z))
    return np.asarray(res.direction.z)[m]


class TestOnChipExitFraction:
    """Port-170 corpus band: 42.3-42.8% of rays exit (BASELINE.md footers;
    simple mode sits within the same band — the rim shaves <0.1% here)."""

    def test_block_kernel(self, block_result):
        assert 0.418 <= _exit_frac(block_result) <= 0.438

    def test_refill_kernel(self, refill_result):
        assert 0.418 <= _exit_frac(refill_result) <= 0.438

    def test_kernels_match_xla_within_mc(self, block_result, refill_result,
                                         xla_result):
        f_x = _exit_frac(xla_result)
        sigma = np.sqrt(f_x * (1 - f_x) / N) * np.sqrt(2)
        assert abs(_exit_frac(block_result) - f_x) < 5 * sigma
        assert abs(_exit_frac(refill_result) - f_x) < 5 * sigma


class TestOnChipExitDistribution:
    """KS two-sample tests of the exit-direction z marginal vs the XLA
    kernel — hardware-PRNG streams differ, so equality is distributional
    (alpha=1e-3 asymptotic band, c(alpha)=1.949)."""

    def _ks_ok(self, a, b):
        from scipy.stats import ks_2samp

        stat = ks_2samp(a, b).statistic
        n, m = len(a), len(b)
        return stat < 1.949 * np.sqrt((n + m) / (n * m)), stat

    def test_block_kernel_ks(self, block_result, xla_result):
        ok, stat = self._ks_ok(_exit_dirs_z(block_result),
                               _exit_dirs_z(xla_result))
        assert ok, f"KS stat {stat}"

    def test_refill_kernel_ks(self, refill_result, xla_result):
        ok, stat = self._ks_ok(_exit_dirs_z(refill_result),
                               _exit_dirs_z(xla_result))
        assert ok, f"KS stat {stat}"

    def test_bounce_mean(self, block_result, refill_result, xla_result):
        b_x = np.asarray(xla_result.n_bounces, np.float64)
        se = np.sqrt(b_x.var() / N) * np.sqrt(2)
        for res in (block_result, refill_result):
            b = np.asarray(res.n_bounces, np.float64).mean()
            assert abs(b - b_x.mean()) < 5 * se, (b, b_x.mean())


class TestOnChipScoring:
    """Scoring numerics on the real chip.  TPU matmuls truncate f32
    inputs to bf16 by DEFAULT precision; the Plucker scorers are
    cancellation-sensitive, so a precision regression is invisible to the
    CPU suite (CPU f32 matmuls are exact) and historically surfaced as
    +40%-per-row spurious hits / a 12x-inflated map tail (benchmarks/
    RESULTS.md 'Scoring precision').  These pins catch that class on
    hardware, including any change to the anchored-frame feature path."""

    N_SCORE = 262_144

    @pytest.fixture(scope="class")
    def scored(self):
        from altair_tpu import DetectorGrid
        from altair_tpu.core.score import fluxmap_trace_once
        from altair_tpu.core.trace_waves import trace_rays_auto

        scene = SCENE_OPTIMIZE.with_(max_bounces=4096)
        grid = DetectorGrid()
        n = self.N_SCORE

        @jax.jit
        def maps(k):
            res = trace_rays_auto(k, scene, SOURCE_OVERNIGHT, n,
                                  TraceConfig())
            cm = fluxmap_trace_once(res, grid, scene.exit_port_z,
                                    method="mxu")
            ce = fluxmap_trace_once(res, grid, scene.exit_port_z,
                                    method="exact")
            return cm, ce

        cm, ce = jax.block_until_ready(maps(jax.random.key(11)))
        return np.asarray(cm, np.int64), np.asarray(ce, np.int64)

    def test_mxu_equals_exact_per_cell(self, scored):
        cm, ce = scored
        # residual budget from the r2/r3 validation: genuine fp32 disk-edge
        # rounding only — max 10 counts per cell, total within 2e-5 of hits
        assert np.abs(cm - ce).max() <= 10, np.abs(cm - ce).max()
        assert abs(int(cm.sum()) - int(ce.sum())) <= max(
            10, 2e-5 * ce.sum()), (cm.sum(), ce.sum())

    def test_binomial_engine_tracks_traceonce(self, scored):
        """Cross-METHOD total agreement (the check that caught the bf16
        corruption: per-method map totals diverged).  The binomial
        engine's expected cell mean is n_per_pos * pi_p; its map total
        must track the trace-once estimate of n * sum_p pi_p."""
        from altair_tpu import DetectorGrid
        from altair_tpu.core.score import fluxmap_retrace_binomial

        cm, _ = scored
        scene = SCENE_OPTIMIZE.with_(max_bounces=4096)
        n_per, over = 2000, 32
        cb = jax.block_until_ready(jax.jit(
            lambda k: fluxmap_retrace_binomial(
                k, scene, SOURCE_OVERNIGHT, DetectorGrid(), n_per,
                TraceConfig(), oversample=over))(jax.random.key(12)))
        total_b = int(np.asarray(cb, np.int64).sum())
        expect = n_per * int(cm.sum()) / self.N_SCORE
        # MC bands: shared-sample correlation across cells dominates
        # (sd ~ n * sd(hits/ray)/sqrt(M) ~ 45 at these sizes); 12%
        # relative is ~5 sigma yet far below the 40%-class corruption
        assert abs(total_b - expect) <= 0.12 * expect, (total_b, expect)


class TestOnChipDispatch:
    def test_full_dispatch_exact_rim_band(self):
        """trace_rays_fast (Pallas + deferred rim) under engine='simulate'
        on the production exact-rim scene stays in the corpus band."""
        from altair_tpu.core.trace_waves import trace_rays_auto

        scene = SCENE_OPTIMIZE.with_(max_bounces=4096)
        res = jax.block_until_ready(jax.jit(
            lambda k: trace_rays_auto(k, scene, SOURCE_OVERNIGHT, N,
                                      TraceConfig(engine="simulate")))(
                                          jax.random.key(4)))
        f = int(np.asarray(
            res.exited_port_mask(scene.exit_port_z)).sum()) / N
        assert 0.418 <= f <= 0.433, f
