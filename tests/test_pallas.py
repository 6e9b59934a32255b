"""Pallas TPU bounce kernel, tested on CPU via the Pallas TPU interpreter.

The hardware-PRNG stub of the interpreter returns zeros in this JAX
version, so these tests run the kernel with its counter-based software
RNG (``hw_prng=False``) — identical kernel code path otherwise, so the
geometry/physics of the Mosaic kernel is what's under test.  The compiled
hardware path is exercised by benchmarks/run_all.py on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altair_tpu import SCENE_OPTIMIZE, SOURCE_OVERNIGHT, TraceConfig
from altair_tpu.core.trace import exit_count, trace_rays
from altair_tpu.core.trace_pallas import (
    BLOCK,
    _fmix32,
    _sw_uniform,
    trace_rays_fast,
    trace_rays_pallas,
)

# cap 64 keeps the interpreter fast; both engines truncate identically so
# the statistics stay comparable
SCENE = SCENE_OPTIMIZE.with_(max_bounces=64, exact_rim=False)
CFG = TraceConfig()


@pytest.fixture(scope="module")
def pallas_result():
    return trace_rays_pallas(jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                             BLOCK, CFG, interpret=True, hw_prng=False)


@pytest.fixture(scope="module")
def xla_result():
    return trace_rays(jax.random.key(1), SCENE, SOURCE_OVERNIGHT, BLOCK, CFG)


class TestPallasPhysics:
    def test_exit_fraction_matches_xla(self, pallas_result, xla_result):
        f_p = int(exit_count(pallas_result)) / BLOCK
        f_x = int(exit_count(xla_result)) / BLOCK
        sigma = np.sqrt(f_x * (1 - f_x) / BLOCK) * np.sqrt(2)
        assert abs(f_p - f_x) < 4 * sigma, (f_p, f_x)

    def test_bounce_distribution_matches_xla(self, pallas_result, xla_result):
        b_p = np.asarray(pallas_result.n_bounces, np.float64)
        b_x = np.asarray(xla_result.n_bounces, np.float64)
        se = np.sqrt(b_x.var() / BLOCK) * np.sqrt(2)
        assert abs(b_p.mean() - b_x.mean()) < 4 * se, (b_p.mean(), b_x.mean())

    def test_exit_points_beyond_port(self, pallas_result):
        st = np.asarray(pallas_result.status)
        z = np.asarray(pallas_result.last_point.z)
        assert (z[st == 1] < -100.0).all()  # every exit passed the port plane

    def test_exit_angle_profile_matches_xla(self, pallas_result, xla_result):
        """Mean exit-direction cosine about the port axis must agree with
        the XLA kernel (≈2/3 up to the finite-port correction — the
        distributionSphereDetectorSweep.C observable)."""

        def mean_mu(res):
            mask = np.asarray(res.exited_port_mask())
            return (float((-np.asarray(res.direction.z)[mask]).mean()),
                    int(mask.sum()))

        mu_p, n_p = mean_mu(pallas_result)
        mu_x, n_x = mean_mu(xla_result)
        se = np.sqrt(1 / 18 / min(n_p, n_x)) * np.sqrt(2)  # var(mu) = 1/18
        assert abs(mu_p - mu_x) < 4 * se, (mu_p, mu_x)
        assert abs(mu_p - 2.0 / 3.0) < 0.05  # ballpark of the ideal law

    def test_absorbed_on_shell(self, pallas_result):
        st = np.asarray(pallas_result.status)
        p = np.asarray(pallas_result.last_point.stack())[st == 2]
        r = np.linalg.norm(p, axis=1)
        np.testing.assert_allclose(r, 100.1, atol=1e-2)


class TestPallasRimComposition:
    def test_exact_rim_via_deferred_postpass(self):
        """trace_rays_fast on an exact-rim scene = Pallas main trace + the
        deferred rim continuation; must agree with the XLA rim kernel."""
        scene = SCENE.with_(exact_rim=True)
        res = trace_rays_fast(jax.random.key(2), scene, SOURCE_OVERNIGHT,
                              BLOCK, CFG, interpret=True, hw_prng=False)
        ref = trace_rays(jax.random.key(3), scene, SOURCE_OVERNIGHT, BLOCK,
                         CFG)
        f_p = int(exit_count(res)) / BLOCK
        f_x = int(exit_count(ref)) / BLOCK
        sigma = np.sqrt(f_x * (1 - f_x) / BLOCK) * np.sqrt(2)
        assert abs(f_p - f_x) < 4 * sigma, (f_p, f_x)
        # the rim must have done something: some absorptions sit in the
        # shell band beyond the inner radius (rim-face kills)
        st = np.asarray(res.status)
        r = np.linalg.norm(np.asarray(res.last_point.stack())[st == 2],
                           axis=1)
        assert (r > 100.1 + 1e-3).any()


class TestPallasGuards:
    def test_block_multiple_required(self):
        with pytest.raises(ValueError):
            trace_rays_pallas(jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                              BLOCK + 1, CFG)

    def test_raw_kernel_rejects_exact_rim(self):
        with pytest.raises(NotImplementedError):
            trace_rays_pallas(jax.random.key(0),
                              SCENE.with_(exact_rim=True),
                              SOURCE_OVERNIGHT, BLOCK, CFG)

    def test_interpreter_requires_sw_prng(self):
        with pytest.raises(ValueError):
            trace_rays_pallas(jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                              BLOCK, CFG, interpret=True, hw_prng=True)

    def test_custom_callable_falls_back_to_xla(self):
        """User scatter callables have no kernel lowering — the dispatch
        must route them to the XLA kernel (COS_N_LOBE itself now runs in
        the kernel, see TestPallasNonLambertian)."""
        from altair_tpu.core.sampling import cosine_hemisphere

        def custom(key, incident, normal, scene):
            return cosine_hemisphere(key, normal)

        scene = SCENE.with_(surface_model=custom)
        res = trace_rays_fast(jax.random.key(0), scene, SOURCE_OVERNIGHT,
                              1000, CFG, interpret=True, hw_prng=False)
        assert res.status.shape == (1000,)


class TestPallasNonLambertian:
    """SPECULAR, MIXED_BRDF and COS_N_LOBE in the kernel vs the XLA
    scatter laws — interpret mode, identical caps, statistical
    agreement."""

    @pytest.mark.parametrize("model_name",
                             ["SPECULAR", "MIXED_BRDF", "COS_N_LOBE"])
    def test_exit_stats_match_xla(self, model_name):
        from altair_tpu.config import SurfaceModel

        scene = SCENE.with_(surface_model=SurfaceModel[model_name])
        res_p = trace_rays_pallas(jax.random.key(4), scene, SOURCE_OVERNIGHT,
                                  BLOCK, CFG, interpret=True, hw_prng=False)
        res_x = trace_rays(jax.random.key(5), scene, SOURCE_OVERNIGHT,
                           BLOCK, CFG)
        f_p = int(exit_count(res_p)) / BLOCK
        f_x = int(exit_count(res_x)) / BLOCK
        sigma = np.sqrt(max(f_x, 1e-3) * (1 - min(f_x, 0.999)) / BLOCK)
        assert abs(f_p - f_x) < 5 * sigma * np.sqrt(2), (model_name, f_p,
                                                         f_x)
        b_p = np.asarray(res_p.n_bounces, np.float64)
        b_x = np.asarray(res_x.n_bounces, np.float64)
        se = np.sqrt(b_x.var() / BLOCK) * np.sqrt(2)
        assert abs(b_p.mean() - b_x.mean()) < 5 * se, (model_name,
                                                       b_p.mean(),
                                                       b_x.mean())

    def test_specular_exit_direction_profile(self):
        """A specular chamber preserves strong directionality: the exit
        z-direction distribution must agree between kernels (moments)."""
        from altair_tpu.config import SurfaceModel

        scene = SCENE.with_(surface_model=SurfaceModel.SPECULAR)
        res_p = trace_rays_pallas(jax.random.key(6), scene, SOURCE_OVERNIGHT,
                                  BLOCK, CFG, interpret=True, hw_prng=False)
        res_x = trace_rays(jax.random.key(7), scene, SOURCE_OVERNIGHT,
                           BLOCK, CFG)

        def mu(res):
            m = np.asarray(res.exited_port_mask())
            return np.asarray(res.direction.z)[m], int(m.sum())

        dz_p, n_p = mu(res_p)
        dz_x, n_x = mu(res_x)
        assert n_p > 100 and n_x > 100
        se = np.sqrt(dz_x.var() / min(n_p, n_x)) * np.sqrt(2)
        assert abs(dz_p.mean() - dz_x.mean()) < 5 * se, (dz_p.mean(),
                                                         dz_x.mean())


class TestRefillKernel:
    """The ray-refill kernel (budget rays per lane, respawn on death) —
    physics vs the XLA kernel in interpret mode."""

    @pytest.fixture(scope="class")
    def refill_result(self):
        from altair_tpu.core.trace_pallas import trace_rays_refill

        return trace_rays_refill(jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                                 BLOCK * 2, CFG, rays_per_lane=2,
                                 interpret=True, hw_prng=False)

    def test_exit_fraction_matches_xla(self, refill_result):
        n = BLOCK * 2
        f_r = int(exit_count(refill_result)) / n
        ref = trace_rays(jax.random.key(1), SCENE, SOURCE_OVERNIGHT, n, CFG)
        f_x = int(exit_count(ref)) / n
        sigma = np.sqrt(f_x * (1 - f_x) / n) * np.sqrt(2)
        assert abs(f_r - f_x) < 4 * sigma, (f_r, f_x)

    def test_per_slot_results_are_complete(self, refill_result):
        st = np.asarray(refill_result.status)
        assert ((st == 1) | (st == 2) | (st == 3)).all()  # every slot filled
        # both slots of each lane produced real rays: slot-wise exit
        # fractions agree (iid respawns)
        f0 = (st[:BLOCK] == 1).mean()
        f1 = (st[BLOCK:] == 1).mean()
        assert abs(f0 - f1) < 4 * np.sqrt(0.3 * 0.7 / BLOCK) * np.sqrt(2)

    def test_segment_contract(self, refill_result):
        """seg_start sits on the shell (the cap/wall crossing) and exits'
        last points lie beyond the port plane."""
        st = np.asarray(refill_result.status)
        s = np.asarray(refill_result.seg_start.stack())
        r = np.linalg.norm(s, axis=1)
        np.testing.assert_allclose(r, 100.1, atol=1e-2)
        z = np.asarray(refill_result.last_point.z)
        assert (z[st == 1] < -100.0).all()

    def test_block_multiple_guard(self):
        from altair_tpu.core.trace_pallas import trace_rays_refill

        with pytest.raises(ValueError):
            trace_rays_refill(jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                              BLOCK * 2 + 1, CFG, rays_per_lane=2)


class TestRefillHandoff:
    """Tail handoff: the refill loop exits at <= handoff_frac stragglers,
    which finish in the XLA waves tracer.  An aggressive fraction (40%)
    routes a large population through the continuation so the physics
    comparison actually exercises it (the production scene at the
    interpreter's cap leaves no tail at small fractions)."""

    SCENE_H = SCENE_OPTIMIZE.with_(max_bounces=512, exact_rim=False)

    @pytest.fixture(scope="class")
    def handoff_result(self):
        from altair_tpu.core.trace_pallas import trace_rays_refill

        return trace_rays_refill(jax.random.key(0), self.SCENE_H,
                                 SOURCE_OVERNIGHT, BLOCK * 2, CFG,
                                 rays_per_lane=2, interpret=True,
                                 hw_prng=False, handoff_frac=0.40)

    def test_no_running_slots(self, handoff_result):
        st = np.asarray(handoff_result.status)
        assert ((st >= 1) & (st <= 3)).all()

    def test_physics_matches_xla(self, handoff_result):
        n = BLOCK * 2
        rx = trace_rays(jax.random.key(5), self.SCENE_H, SOURCE_OVERNIGHT,
                        n, CFG)
        st, stx = np.asarray(handoff_result.status), np.asarray(rx.status)
        f, fx = (st == 1).mean(), (stx == 1).mean()
        sigma = np.sqrt(fx * (1 - fx) / n) * np.sqrt(2)
        assert abs(f - fx) < 5 * sigma, (f, fx)
        b, bx = (np.asarray(handoff_result.n_bounces),
                 np.asarray(rx.n_bounces))
        se = np.sqrt(bx.var() / n) * np.sqrt(2)
        assert abs(b.mean() - bx.mean()) < 5 * se, (b.mean(), bx.mean())

    def test_segment_on_escape_line(self, handoff_result):
        """Straggler exits carry the XLA seg_start convention (wall point
        or source) — every seg_start must still sit on a line that exits
        the port: last_point beyond the port plane, and the recomputed
        shell crossing (sphere_hit semantics) in the cap."""
        st = np.asarray(handoff_result.status)
        z = np.asarray(handoff_result.last_point.z)
        assert (z[st == 1] < -100.0).all()

    def test_deterministic(self, handoff_result):
        from altair_tpu.core.trace_pallas import trace_rays_refill

        r2 = trace_rays_refill(jax.random.key(0), self.SCENE_H,
                               SOURCE_OVERNIGHT, BLOCK * 2, CFG,
                               rays_per_lane=2, interpret=True,
                               hw_prng=False, handoff_frac=0.40)
        assert (np.asarray(r2.status)
                == np.asarray(handoff_result.status)).all()
        np.testing.assert_array_equal(np.asarray(r2.n_bounces),
                                      np.asarray(handoff_result.n_bounces))

    @pytest.mark.slow
    def test_multi_block_grid(self):
        """n_blocks > 1 exercises the straggler (block, slot, lane) index
        arithmetic — each block gets its own threshold and live planes."""
        from altair_tpu.core.trace_pallas import trace_rays_refill

        scene = SCENE_OPTIMIZE.with_(max_bounces=256, exact_rim=False)
        n = BLOCK * 2 * 2  # 2 blocks at budget 2
        r = trace_rays_refill(jax.random.key(3), scene, SOURCE_OVERNIGHT,
                              n, CFG, rays_per_lane=2, interpret=True,
                              hw_prng=False, handoff_frac=0.40)
        st = np.asarray(r.status)
        assert ((st >= 1) & (st <= 3)).all()
        rx = trace_rays(jax.random.key(6), scene, SOURCE_OVERNIGHT,
                        BLOCK * 2, CFG)
        f, fx = (st == 1).mean(), (np.asarray(rx.status) == 1).mean()
        sigma = np.sqrt(fx * (1 - fx) / (BLOCK * 2)) * np.sqrt(2)
        assert abs(f - fx) < 5 * sigma, (f, fx)
        # per-block exit fractions agree (block-independent respawn law)
        f0 = (st[:n // 2] == 1).mean()
        f1 = (st[n // 2:] == 1).mean()
        assert abs(f0 - f1) < 5 * np.sqrt(fx * (1 - fx) / (n // 2)) * 2
        z = np.asarray(r.last_point.z)
        assert (z[st == 1] < -100.0).all()


class TestSwUniform:
    def test_distribution_moments(self):
        """The counter-based hash must be a credible U[0,1): moments and
        range checked outside the kernel (plain jnp ops)."""
        lane = jnp.arange(1 << 14, dtype=jnp.uint32)
        lane_h = _fmix32(lane ^ jnp.uint32(0xDEADBEEF))
        draws = np.stack([
            np.asarray(_sw_uniform_host(lane_h, jnp.uint32(c)))
            for c in range(8)
        ])
        assert draws.min() >= 0.0 and draws.max() < 1.0
        assert abs(draws.mean() - 0.5) < 0.005
        assert abs(draws.std() - np.sqrt(1 / 12)) < 0.005
        # draws at different counters are decorrelated
        c = np.corrcoef(draws[0], draws[1])[0, 1]
        assert abs(c) < 0.05


def _sw_uniform_host(lane_h, ctr):
    """Host-side replica of _sw_uniform (pltpu.bitcast needs a kernel)."""
    h = _fmix32(lane_h + ctr * jnp.uint32(0x9E3779B9))
    return (h >> jnp.uint32(8)).astype(jnp.float32) * float(2.0 ** -24)
