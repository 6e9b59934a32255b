#!/usr/bin/env python
"""Roofline / MFU accounting for the two PRODUCTION engines (VERDICT r2 #5).

run_all.py rooflines the superseded XLA while-loop tier from XLA's own
cost analysis; the two engines that actually run production are opaque to
that method (the Pallas kernel is a Mosaic black box) or were simply
never accounted (the direct sampler).  This script measures both:

1. **Pallas refill kernel slot rate** — a no-early-exit configuration
   (reflectance 1.0, port closed) makes every ray die by suspension at
   exactly ``max_bounces`` iterations, so the executed slot-iteration
   count is EXACTLY n_rays * max_bounces: the measured wall-clock gives
   the kernel's per-slot-bounce cost with zero duty-cycle ambiguity.
   Swept over ``rays_per_lane`` (budget) to expose the cost of the
   per-slot result-parking selects (8 planes x budget selects per
   iteration — the only term that scales with budget).
2. **Duty cycle at production** — the production workload's useful-
   bounce rate (rays/s x mean bounces) over the slot rate says how much
   of the kernel's iteration capacity does useful work vs idles in the
   refill tail.
3. **Direct sampler** — pure XLA, so flops/bytes per ray come from the
   compiled program's own cost analysis; measured rays/s then gives
   achieved FLOP/s, %VPU and %HBM directly, per rng_impl and qmc mode.

Usage:  python benchmarks/roofline_kernels.py [--json OUT.json] [--n 16777216]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _util import atomic_json_dump  # noqa: E402

# v5e peaks — keep in sync with run_all.py
V5E_PEAK = {"vpu_fp32_flops": 3.9e12, "hbm_bytes_s": 819e9}


def _readback(x):
    import jax
    import jax.numpy as jnp
    jax.block_until_ready(x)
    return float(jnp.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(f, *args, repeats=3):
    _readback(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _readback(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--n", type=int, default=16 * (1 << 20))
    ap.add_argument("--slot-bounces", type=int, default=64,
                    help="fixed bounce count for the slot-rate run "
                         "(multiple of INNER_ITERS)")
    ap.add_argument("--handoff", action="store_true",
                    help="also sweep tail-handoff fraction x budget "
                         "(8 extra programs = 8 remote compiles)")
    ap.add_argument("--handoff-budgets", type=int, nargs="+",
                    default=[4, 8],
                    help="ray budgets for the --handoff sweep; the r5 "
                         "base data shows the raw slot rate is highest at "
                         "budget 1 (7.0 vs 5.3 G bounces/s at 4), so with "
                         "the tail handoff absorbing the idle tail a "
                         "lower budget may win — sweep 1 2 to check")
    ap.add_argument("--rim-split", action="store_true",
                    help="stage budget of the direct engine's deferred-rim "
                         "pipeline (5 extra programs): cumulative prefixes "
                         "main / +clip+compact / +continuation / +merge, "
                         "plus the dispatched full path")
    ap.add_argument("--brdf-slot", action="store_true",
                    help="measure the MIXED_BRDF kernel's slot rate and "
                         "its shipped-constant refill rate (2 extra "
                         "programs) — the simulate-tier roofline argument")
    ap.add_argument("--simulate-split", action="store_true",
                    help="also split the simulate tier's exact-rim cost "
                         "(kernel vs rim post-pass) and sweep the rim "
                         "continuation's wave schedule "
                         "(8 extra programs = 8 remote compiles)")
    ap.add_argument("--skip-base", action="store_true",
                    help="skip sections 1-3 (slot rate / duty cycle / "
                         "direct sampler) so an opted-in section can run "
                         "alone without recompiling the heavy kernels")
    ap.add_argument("--direct", action="store_true",
                    help="run section 3 (direct-sampler cost analysis + "
                         "rates per rng/qmc mode) even with --skip-base — "
                         "for finishing a run whose base sections already "
                         "landed (3 extra programs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from altair_tpu import SCENE_OPTIMIZE, SOURCE_OVERNIGHT, TraceConfig
    from altair_tpu.core.trace_pallas import (
        BLOCK, INNER_ITERS, trace_rays_refill)
    from altair_tpu.core.trace_direct import trace_rays_direct

    out = {"device": jax.devices()[0].device_kind, "n_rays": args.n}

    def log(k, v):
        out[k] = v
        print(f"[{k}] {v}", flush=True)
        if args.json:  # incremental: a timeout mid-sweep keeps prior rows
            atomic_json_dump(args.json, out)

    src = SOURCE_OVERNIGHT
    K = args.slot_bounces
    assert K % INNER_ITERS == 0, "partial INNER_ITERS block would blur count"

    sc_prod = SCENE_OPTIMIZE.with_(max_bounces=4096, exact_rim=False)

    if not args.skip_base:
        # ---- 1. slot rate: no early exit => slot-iterations == n * K ------
        # port ~closed (cap fraction ~8e-9 => ~8 escapes per 1e9 wall hits,
        # <1e-6 relative slot-count error) + reflectance 1 => every ray
        # suspends at exactly K iterations, lanes in lockstep.
        sc_slot = SCENE_OPTIMIZE.with_(reflectance=1.0,
                                       theta_max_deg=179.99,
                                       max_bounces=K, exact_rim=False)
        for budget in (1, 2, 4, 8):
            n = (args.n // (BLOCK * budget)) * (BLOCK * budget)
            f = jax.jit(lambda k, b=budget, nn=n: trace_rays_refill(
                k, sc_slot, src, nn, TraceConfig(), rays_per_lane=b)
                .status.sum())
            t = timeit(f, jax.random.key(0), repeats=2)
            rate = n * K / t
            log(f"slot_bounces_per_s_budget{budget}", round(rate))
        slot_rate = out["slot_bounces_per_s_budget4"]  # the shipped budget

        # ---- 2. production duty cycle (shipped budget=4, simple mode) -----
        n = (args.n // (BLOCK * 4)) * (BLOCK * 4)
        res_fn = jax.jit(lambda k: trace_rays_refill(
            k, sc_prod, src, n, TraceConfig(), rays_per_lane=4))
        res = res_fn(jax.random.key(1))
        mean_b = float(res.n_bounces.mean())
        f = jax.jit(lambda k: res_fn(k).status.sum())
        t = timeit(f, jax.random.key(1), repeats=2)
        rays_s = n / t
        useful = rays_s * mean_b
        log("refill_prod_rays_per_s", round(rays_s))
        log("refill_prod_mean_bounces", round(mean_b, 2))
        log("refill_useful_bounces_per_s", round(useful))
        log("refill_duty_pct", round(100 * useful / slot_rate, 1))

    # ---- 2b. tail-handoff sweep: straggler fraction x budget --------------
    # the handoff trades idle-tail kernel iterations for one compaction +
    # a small waves-tracer continuation; past some fraction the
    # continuation itself dominates.
    for budget in tuple(args.handoff_budgets) if args.handoff else ():
        for frac in (0.005, 0.01, 0.03, 0.06):
            nb = (args.n // (BLOCK * budget)) * (BLOCK * budget)
            f = jax.jit(lambda k, b=budget, fr=frac, nn=nb:
                        trace_rays_refill(
                            k, sc_prod, src, nn, TraceConfig(),
                            rays_per_lane=b, handoff_frac=fr).status.sum())
            t = timeit(f, jax.random.key(1), repeats=2)
            log(f"refill_handoff_b{budget}_f{frac}_rays_per_s",
                round(nb / t))

    # ---- 2b2. MIXED_BRDF slot rate + shipped-constant refill rate ---------
    # For the simulate-tier roofline ARGUMENT (VERDICT r4 #4): the BRDF
    # kernel's per-slot-iteration cost (vs the Lambertian slot rate of
    # section 1) bounds the production path; the shipped-constant refill
    # rate alongside gives the duty cycle the tail handoff achieves on
    # this physics (nonLambertianFlux.C:147-208's 7-draw mixture scatter).
    if args.brdf_slot:
        from altair_tpu.config import SurfaceModel
        sc_bslot = SCENE_OPTIMIZE.with_(
            reflectance=1.0, theta_max_deg=179.99, max_bounces=K,
            exact_rim=False, surface_model=SurfaceModel.MIXED_BRDF)
        n = (args.n // (BLOCK * 4)) * (BLOCK * 4)
        f = jax.jit(lambda k: trace_rays_refill(
            k, sc_bslot, src, n, TraceConfig(), rays_per_lane=4)
            .status.sum())
        t = timeit(f, jax.random.key(0), repeats=2)
        log("brdf_slot_bounces_per_s_budget4", round(n * K / t))
        # production-physics BRDF refill at the SHIPPED handoff constants
        # (simple mode — the rim post-pass cost is the delta vs run_all's
        # end-to-end throughput_brdf_rays_s row)
        sc_bprod = sc_prod.with_(surface_model=SurfaceModel.MIXED_BRDF)
        res_fn = jax.jit(lambda k: trace_rays_refill(
            k, sc_bprod, src, n, TraceConfig(), rays_per_lane=4,
            handoff_frac=0.01))
        mean_b = float(res_fn(jax.random.key(1)).n_bounces.mean())
        f = jax.jit(lambda k: res_fn(k).status.sum())
        t = timeit(f, jax.random.key(1), repeats=2)
        log("brdf_refill_handoff_rays_per_s", round(n / t))
        log("brdf_refill_mean_bounces", round(mean_b, 2))

    # ---- 2c. simulate-tier rim split (VERDICT r3 #4) -----------------------
    # Where does the exact-rim post-pass cost go on the simulate tier?
    # Simple-mode rate vs exact-rim rate gives the post-pass cost; the rim
    # continuation (non-closed-form walls take the WAVES branch of
    # trace_rays_rim_deferred) enters its 1/2.8-occupancy clip buffer for a
    # full 96-iteration wave before compacting, so the sweep varies the
    # first-wave length / shrink (trace.RIM_CONT_*) to find the schedule
    # optimum for both the Lambertian simulate benchmark workload and the
    # MIXED_BRDF production scene (nonLambertianFlux.C:307-387).
    if args.simulate_split:
        from altair_tpu.config import SurfaceModel
        from altair_tpu.core import trace as trace_mod
        from altair_tpu.core.trace_pallas import trace_rays_fast

        cfgsim = TraceConfig(engine="simulate")
        n = (args.n // (BLOCK * 4)) * (BLOCK * 4)
        scenes = (
            ("lamb", SCENE_OPTIMIZE.with_(max_bounces=4096)),
            ("brdf", SCENE_OPTIMIZE.with_(
                max_bounces=4096, surface_model=SurfaceModel.MIXED_BRDF)),
        )
        defaults = (trace_mod.RIM_CONT_FIRST_WAVE, trace_mod.RIM_CONT_SHRINK,
                    trace_mod.RIM_CONT_WAVE_ITERS)
        try:
            for name, sc in scenes:
                f = jax.jit(lambda k, s=sc.with_(exact_rim=False):
                            trace_rays_fast(k, s, src, n, cfgsim)
                            .status.sum())
                t = timeit(f, jax.random.key(3), repeats=2)
                log(f"simulate_{name}_simple_rays_per_s", round(n / t))
                # (first_wave, shrink): None/4 is the shipped schedule;
                # short first waves need shrink 2 (fewer lanes die before
                # the first compaction; exit_frac catches any silent loss)
                for fw, sh in ((None, 4), (8, 2), (16, 2), (32, 2)):
                    trace_mod.RIM_CONT_FIRST_WAVE = fw
                    trace_mod.RIM_CONT_SHRINK = sh

                    def run(k, s=sc):
                        r = trace_rays_fast(k, s, src, n, cfgsim)
                        return r.exited_port_mask(s.exit_port_z).sum()

                    g = jax.jit(run)
                    nx = _readback(g(jax.random.key(3)))  # compile + warm
                    t = timeit(g, jax.random.key(3), repeats=2)
                    tag = f"simulate_{name}_rim_fw{fw}_sh{sh}"
                    log(f"{tag}_rays_per_s", round(n / t))
                    log(f"{tag}_exit_frac", round(nx / n, 5))
                    # exact count so the tuner's drift check compares
                    # unrounded fractions (ADVICE r4)
                    log(f"{tag}_n_exit", int(nx))
        finally:
            (trace_mod.RIM_CONT_FIRST_WAVE, trace_mod.RIM_CONT_SHRINK,
             trace_mod.RIM_CONT_WAVE_ITERS) = defaults

    # ---- 2d. direct-engine rim-pipeline stage budget ----------------------
    # The flagship sustained number (71.2 M rays/s exact-rim at 16M,
    # results_v5e_r5) spends ~70% of its wall time OUTSIDE the 245-251
    # M rays/s closed-form sampler — this section attributes it.  Four
    # cumulative-prefix programs replicate the deferred-rim pipeline
    # (trace.py:618-720, hybrid-continuation branch) so each stage's cost
    # is the delta between consecutive prefixes, with the ~30 ms per-call
    # transport floor cancelling in the subtraction (four separate
    # stage-only programs would each pay the floor and lose the fusion).
    if args.rim_split:
        from altair_tpu.core import trace as T
        from altair_tpu.core.geometry import (
            Vec3, cone_crossing_t, cone_face_normal)
        from altair_tpu.core.sampling import scatter as scatter_fn
        from altair_tpu.core.trace_waves import trace_rays_auto

        sc_rim = SCENE_OPTIMIZE.with_(max_bounces=4096)  # exact_rim default
        cfgr = TraceConfig()
        dtype = cfgr.dtype
        n = args.n
        m = min(n, max(256, n >> 4))  # capacity_shift=4, trace.py:631

        def stages(k, upto):
            k_main, k_first, k_cont = jax.random.split(k, 3)
            res = trace_rays_direct(k_main, sc_rim.with_(exact_rim=False),
                                    src, n, cfgr)
            if upto == 0:
                return res.status.sum()
            radius = jnp.asarray(sc_rim.inner_radius, dtype)
            r_out = jnp.asarray(sc_rim.outer_radius, dtype)
            cos_tm = jnp.cos(jnp.deg2rad(
                jnp.asarray(sc_rim.theta_max_deg, dtype)))
            INF = 1e30
            q = T.sphere_hit(res.seg_start, res.direction, radius)
            s_rim = cone_crossing_t(q, res.direction, cos_tm, radius,
                                    r_out, INF)
            clipped = (res.status == T.EXITED) & (s_rim < INF)
            rim_pt = q + res.direction.scale(s_rim)
            if upto == "clip":       # clip mask alone (elementwise over n)
                return clipped.sum()
            if upto == "nonzero":    # + the grouped nonzero (index build)
                from altair_tpu.core.compact import nonzero_indices_grouped
                idx0, drop0 = nonzero_indices_grouped(
                    clipped, m, n, max(256, m >> 1))
                return idx0.sum() + drop0
            idx, valid, (c_pt, c_dir, c_prev), (c_b,), dropped = \
                T._compact_gather(
                    clipped, [rim_pt, res.direction, res.seg_start],
                    [res.n_bounces], m, n,
                    group_capacity=max(256, m >> 1))
            if upto == 1:
                return idx.sum() + c_b.sum() + c_pt.x.sum()
            c_bounces = c_b + valid.astype(jnp.int32)
            k_surv, k_scat = jax.random.split(k_first)
            survive = (jax.random.uniform(k_surv, (m,), dtype)
                       < jnp.asarray(sc_rim.reflectance, dtype))
            d_scat = scatter_fn(k_scat, sc_rim.surface_model, c_dir,
                                cone_face_normal(c_pt), sc_rim)
            status0 = jnp.where(valid & survive, T.RUNNING,
                                T.ABSORBED).astype(jnp.int32)
            c_dir2 = Vec3.where(survive, d_scat, c_dir)
            carry = (c_pt, c_dir2, c_prev, status0, c_bounces,
                     valid & survive)
            pos, direction, prev, status, bounces, _ = \
                T._rim_continuation_hybrid(k_cont, sc_rim, carry, cfgr,
                                           radius, r_out, cos_tm, INF)
            if upto == 2:
                return status.sum() + bounces.sum() + pos.x.sum()
            sidx = jnp.where(valid, idx, n)

            def sv(out, new):
                return Vec3(out.x.at[sidx].set(new.x, mode="drop"),
                            out.y.at[sidx].set(new.y, mode="drop"),
                            out.z.at[sidx].set(new.z, mode="drop"))

            st = res.status.at[sidx].set(status, mode="drop")
            lp = sv(res.last_point, pos)
            ss = sv(res.seg_start, prev)
            dr = sv(res.direction, direction)
            nb = res.n_bounces.at[sidx].set(bounces, mode="drop")
            return (st.sum() + nb.sum() + lp.x.sum() + ss.x.sum()
                    + dr.x.sum())

        plan = ((0, "main"), ("clip", "cliponly"), ("nonzero", "nonzero"),
                (1, "clip_compact"), (2, "continuation"),
                (3, "scatter_merge"))
        for upto, name in plan:
            f = jax.jit(lambda k, u=upto: stages(k, u))
            t = timeit(f, jax.random.key(7), repeats=2)
            log(f"rim_split_prefix_{name}_s", round(t, 4))
        # the real dispatched path, same key, for cross-checking the
        # prefix-3 replica against what production actually runs
        f = jax.jit(lambda k: trace_rays_auto(k, sc_rim, src, n, cfgr)
                    .status.sum())
        t = timeit(f, jax.random.key(7), repeats=2)
        log("rim_split_full_auto_s", round(t, 4))
        log("rim_split_full_auto_rays_per_s", round(n / t))

    # ---- 3. direct sampler: XLA cost analysis + measured rate -------------
    sc_dir = SCENE_OPTIMIZE.with_(exact_rim=False)
    for label, cfg in () if (args.skip_base and not args.direct) else (
            ("threefry", TraceConfig()),
            ("rbg", TraceConfig(rng_impl="rbg")),
            ("qmc", TraceConfig(qmc=1))):
        f = jax.jit(lambda k, c=cfg: trace_rays_direct(
            k, sc_dir, src, args.n, c).status.sum())
        key = jax.random.key(2, impl=cfg.rng_impl)
        lowered = f.lower(key).compile()
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else (ca or {})
        flops_ray = float(ca.get("flops", 0.0)) / args.n
        transc_ray = float(ca.get("transcendentals", 0.0)) / args.n
        bytes_ray = float(ca.get("bytes accessed", 0.0)) / args.n
        t = timeit(f, key, repeats=3)
        rate = args.n / t
        log(f"direct_{label}_rays_per_s", round(rate))
        log(f"direct_{label}_flops_per_ray", round(flops_ray, 1))
        log(f"direct_{label}_transc_per_ray", round(transc_ray, 1))
        log(f"direct_{label}_bytes_per_ray", round(bytes_ray, 1))
        log(f"direct_{label}_vpu_pct",
            round(100 * rate * flops_ray / V5E_PEAK["vpu_fp32_flops"], 1))
        log(f"direct_{label}_hbm_pct",
            round(100 * rate * bytes_ray / V5E_PEAK["hbm_bytes_s"], 1))

    if args.json:
        atomic_json_dump(args.json, out)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
