"""Direct-sampling trace engine — the integrating-sphere chain in closed form.

The simulation kernels (``trace.py``, ``trace_pallas.py``) advance every ray
through ~1/p ≈ 57 explicit bounces.  For a **pure Lambertian** sphere interior
none of that iteration is necessary, because of the classical integrating-
sphere identity the reference's own analytic layer is built on
(``finitePort/subtendedFlux.py:16-27`` uses its corollary, the sphere
multiplier 1/(1-rho(1-f))):

    From any point p on the interior of a sphere, a cosine-weighted
    (Lambertian) emission hits the sphere at a point q that is distributed
    **uniformly over the whole sphere surface, independent of p** — the
    form factor between any two patches of a sphere interior is uniform
    (dF = dA / 4πR²).

Consequences, all exact (no approximation):

* every wall-hit point after the first is i.i.d. uniform on the sphere;
* a flight escapes through the port cap with probability f = cap area
  fraction = (1 + cos(theta_max)) / 2, independently each flight;
* the bounce chain is a Markov chain with per-round continue probability
  s = (1 - f) * rho  (flight stays on the wall, roulette survives) — the
  number of completed rounds is Geometric(1 - s) and the terminal event is
  exit with probability f / (f + (1-f)(1-rho)), independent of the count;
* the final segment of an exiting ray is (p, q) with p uniform on the wall
  band (or the deterministic first hit when no full round completed) and q
  uniform on the cap, independent.

So the whole trace collapses to seven uniform draws per ray: no bounce
loop, no trig-heavy scatter sampling, no while-loop.  The result is
distribution-identical to ``trace_rays`` on a simple-mode (no-rim)
Lambertian scene — same physics, sampled from its closed-form law instead
of simulated — and is validated against the simulation kernels and the
reference corpus invariants in ``tests/test_trace_direct.py``.

Scope / composition:

* LAMBERTIAN walls only (the identity is specific to cosine-weighted
  re-emission; SPECULAR / MIXED_BRDF / COS_N_LOBE chains have memory and
  stay on the simulation kernels).
* Simple-mode physics only: exact-rim scenes compose this engine as the
  main phase of ``trace_rays_rim_deferred`` — the rim post-pass clip-tests
  the sampled escape segments and re-traces the ~2% clipped lanes with the
  in-loop rim kernel, exactly as it does for the Pallas main trace.
* ``keep_history`` requires real paths -> simulation kernel.
* The suspension tail is exact: a lane whose geometric round count would
  overrun ``scene.max_bounces`` is SUSPENDED with the cap's bounce count,
  matching the reference's ``ray->Suspend()`` guard
  (``fluxAtObserverOptimize.C:271-273``); at the reference's cap of 50,000
  vs s ≈ 0.9827 the probability is ~e^-860.  Documented divergence: a
  SUSPENDED lane's ``direction`` here is the incoming band-to-band chord
  (b2 - b1), while the simulators leave the freshly scattered OUTGOING
  direction (whose unrealised next hit is uniform over the sphere) — a
  different marginal.  Every shipped scorer filters on EXITED, so this is
  visible only to consumers reading suspended lanes at caps low enough
  for suspensions to matter (s^cap non-negligible).

Replaces: the hot path of ``AOpticsManager::TraceNonSequential``
(``fluxAtObserverOptimize.C:295``) for the production Lambertian scene —
the reference pays ~10^8 ROBAST navigation steps per sweep for a chain
whose law is known in closed form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SphereScene, Source, SurfaceModel, TraceConfig
from .geometry import Vec3, ray_box_exit_t, sphere_hit
from .trace import ABSORBED, EXITED, SUSPENDED, TraceResult, _source_rays


def direct_applicable(scene: SphereScene, cfg: TraceConfig) -> bool:
    """True when ``trace_rays_direct`` computes the same distribution the
    simulation kernels would (static checks only; traced numeric scene
    parameters are fine — the sampler is closed-form in them)."""
    return (not callable(scene.surface_model)
            and SurfaceModel(scene.surface_model) == SurfaceModel.LAMBERTIAN
            and int(cfg.keep_history) == 0)


def _sphere_point(radius, z_frac, phi, dtype):
    """Point on the sphere of ``radius`` at height fraction z/r = z_frac
    and azimuth phi (uniform z_frac + uniform phi == uniform on the zone)."""
    rho = jnp.sqrt(jnp.maximum(1.0 - z_frac * z_frac, 0.0))
    return Vec3(radius * rho * jnp.cos(phi),
                radius * rho * jnp.sin(phi),
                radius * z_frac)


def trace_rays_direct(
    key: jax.Array,
    scene: SphereScene,
    source: Source,
    n_rays: int,
    cfg: TraceConfig = TraceConfig(),
) -> TraceResult:
    """Sample the trace outcome of ``n_rays`` directly from its closed-form
    law (see module docstring).  Simple-mode Lambertian scenes only; use
    ``trace_rays_auto`` for automatic exact-rim composition.

    Per-lane case analysis (mirrors the per-iteration semantics of
    ``trace.py::make_bounce_step``, simple branch):

    * first flight escapes -> EXITED, 0 bounces, segment = (source, box);
    * roulette kills at the first hit h1 -> ABSORBED, 1 bounce;
    * G full rounds then an escaping flight -> EXITED, 1+G bounces,
      segment start = h1 if G == 0 else uniform band point;
    * G full rounds then a killed wall hit -> ABSORBED, 2+G bounces;
    * chain still alive after the bounce cap -> SUSPENDED, cap bounces.
    """
    if cfg.keep_history:
        raise ValueError("direct sampling has no path history; "
                         "use trace_rays for the visual-demo path")
    if not direct_applicable(scene, cfg):
        raise NotImplementedError(
            "direct sampling requires a (static) LAMBERTIAN surface model")
    if scene.exact_rim:
        raise NotImplementedError(
            "the direct sampler draws simple-mode physics; exact-rim scenes "
            "compose it via trace_rays_rim_deferred (see trace_rays_auto)")

    pos0, dir0 = _source_rays(source, n_rays, cfg.dtype)
    return trace_direct_from_state(key, scene, pos0, dir0,
                                   jnp.zeros((n_rays,), jnp.int32), cfg)


def trace_direct_from_state(
    key: jax.Array,
    scene: SphereScene,
    pos0: Vec3,
    dir0: Vec3,
    bounces0: jax.Array,
    cfg: TraceConfig = TraceConfig(),
) -> TraceResult:
    """Closed-form completion from an arbitrary per-lane mid-flight state.

    ``(pos0, dir0)`` may be any interior point (or wall point) with any
    unit direction: the FIRST flight is computed explicitly (sphere_hit —
    exactness does not require it to be uniform), and everything after its
    first Lambertian wall scatter follows the uniform chain law.  This is
    what lets the deferred-rim continuation hand its interior survivors to
    the direct sampler: a lane sitting at a wall point with a freshly
    scattered direction, or mid-flight after re-entering through the cap,
    is exactly this state.  ``bounces0`` is the already-accumulated wall
    count (added to the sampled chain's); the remaining chain gets a fresh
    ``scene.max_bounces`` budget (same documented one-budget slack as the
    in-loop continuation restart in ``trace_rays_rim_deferred``).
    """
    dtype = cfg.dtype
    n_rays = pos0.x.shape[0]
    shape = (n_rays,)
    radius = jnp.asarray(scene.inner_radius, dtype)
    cos_tm = jnp.cos(jnp.deg2rad(jnp.asarray(scene.theta_max_deg, dtype)))
    cos_cap = radius * cos_tm
    rho = jnp.asarray(scene.reflectance, dtype)
    world_half = jnp.asarray(scene.world_half, dtype)
    max_iters = int(scene.max_bounces)

    # deterministic first flight (the only non-uniform step of the chain)
    q1 = sphere_hit(pos0, dir0, radius)
    esc1 = q1.z < cos_cap

    # one fused threefry call for all seven per-lane uniforms — or, with
    # cfg.qmc, one digitally-shifted Sobol block: the chain consumes a
    # FIXED 7 dimensions per ray, so low-discrepancy sampling applies
    # directly (impossible for the simulators' unbounded streams); each
    # key gives a fresh unbiased randomisation (core/qmc.py)
    if cfg.qmc:
        from .qmc import sobol_uniforms

        u = sobol_uniforms(key, n_rays, 7, dtype,
                           mode="owen" if cfg.qmc >= 2 else "shift")
    else:
        u = jax.random.uniform(key, (7,) + shape, dtype)
    u_s1, u_g, u_term, u_pz, u_pphi, u_qz, u_qphi = u

    f = (1.0 + cos_tm) * 0.5          # cap area fraction = escape prob/flight
    s = (1.0 - f) * rho               # per-round continue probability
    surv1 = u_s1 < rho

    # completed rounds G ~ Geometric(1 - s): G = floor(log(1-u)/log(s)).
    # log(s) == 0 (s -> 1, i.e. rho == 1 and f -> 0) gives ratio -inf/0 ->
    # -inf guarded to the cap; s == 0 gives ratio/-inf -> 0.
    log_s = jnp.log(jnp.maximum(s, jnp.asarray(1e-30, dtype)))
    ratio = jnp.log1p(-u_g) / jnp.where(log_s == 0, -1e-30, log_s)
    cap_f = jnp.asarray(float(max_iters), dtype)
    G = jnp.floor(jnp.minimum(ratio, cap_f)).astype(jnp.int32)

    # terminal event (memoryless => independent of G): exit vs absorption
    pe_den = f + (1.0 - f) * (1.0 - rho)
    p_exit = f / jnp.where(pe_den == 0, 1.0, pe_den)
    term_exit = u_term < p_exit

    # chain alive after the iteration cap: first flight + (max_iters - 1)
    # full rounds all continued
    susp = surv1 & ~esc1 & (ratio >= cap_f - 1.0)

    # band point B1 (z/r in [cos_tm, 1]) — the last wall point for G >= 1;
    # band point B2 — the absorbing/suspended wall point; cap point Q —
    # the exit crossing (z/r in [-1, cos_tm]), uniform on the cap.
    b1 = _sphere_point(radius, cos_tm + u_pz * (1.0 - cos_tm),
                       u_pphi * (2.0 * jnp.pi), dtype)
    b2 = _sphere_point(radius, cos_tm + u_qz * (1.0 - cos_tm),
                       u_qphi * (2.0 * jnp.pi), dtype)
    qcap = _sphere_point(radius, -1.0 + u_qz * (1.0 + cos_tm),
                         u_qphi * (2.0 * jnp.pi), dtype)

    # ---- assemble the five outcome classes ------------------------------
    exited = esc1 | (surv1 & ~esc1 & ~susp & term_exit)
    absorbed_h1 = ~esc1 & ~surv1
    absorbed_late = surv1 & ~esc1 & ~susp & ~term_exit

    # segment start: source for a first-flight escape / first-hit kill;
    # h1 when no full round completed; else a uniform band point
    p_late = Vec3.where(G == 0, q1, b1)
    seg_start = Vec3.where(esc1 | absorbed_h1, pos0,
                           Vec3.where(susp, b1, p_late))

    # final direction: the last flight's chord
    d_exit = (qcap - p_late).normalized(1e-20)
    d_exit = Vec3.where(esc1, dir0, d_exit)
    d_wall = (b2 - p_late).normalized(1e-20)
    d_wall = Vec3.where(susp, (b2 - b1).normalized(1e-20), d_wall)
    direction = Vec3.where(exited, d_exit,
                           Vec3.where(absorbed_h1, dir0, d_wall))

    # last point: exits fly on to the world box; wall deaths stop there
    t_box = ray_box_exit_t(seg_start, direction, world_half)
    box_pt = seg_start + direction.scale(t_box)
    last = Vec3.where(exited, box_pt,
                      Vec3.where(absorbed_h1, q1, b2))

    status = jnp.where(
        exited, EXITED,
        jnp.where(susp, SUSPENDED, ABSORBED)).astype(jnp.int32)
    bounces = bounces0 + jnp.where(
        esc1, 0,
        jnp.where(absorbed_h1, 1,
                  jnp.where(susp, max_iters,
                            jnp.where(absorbed_late, 2 + G, 1 + G))))
    return TraceResult(
        status=status,
        last_point=last,
        seg_start=seg_start,
        direction=direction,
        n_bounces=bounces.astype(jnp.int32),
    )
