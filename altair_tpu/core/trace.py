"""The bounce kernel — TPU-native replacement for
``AOpticsManager::TraceNonSequential`` (ROBAST's C++ trace loop, called at
``fluxAtObserver.C:202`` / ``fluxAtObserverOptimize.C:295``).

Instead of an object-per-ray state machine on <=4 CPU threads
(``fluxAtObserverOptimize.C:450-454``), the whole batch advances one bounce
per iteration of a ``lax.while_loop``: closed-form sphere intersection, port
test, reflectance roulette, scatter sample — all ``[N]``-vectorised on the
VPU.  Rays are structure-of-arrays (three ``[N]`` component arrays), statuses
are an ``[N]`` int vector (replacing ``ARayArray::GetStopped/GetExited``
partitioning with masks), and the loop exits as soon as every ray is dead.

The per-ray payload kept is exactly what every scorer in the reference uses:
the final segment (second-to-last point, last point, direction) — see
``RayEndpoint`` at ``fluxAtObserverFast.C:1156-1161`` — plus status and
bounce count.  Full path history is an opt-in bounded buffer for the visual
demo path only (``ARay::MakePolyLine3D`` parity).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SphereScene, Source, TraceConfig
from .geometry import Vec3, ray_box_exit_t, sphere_hit
from .sampling import scatter

# Ray status codes (ARay state machine, fluxAtObserverOptimize.C:271-273,
# fluxAtObserverFast.C:1504-1510).
RUNNING = 0     # still bouncing inside the sphere
EXITED = 1      # escaped through the port cap, flew to the world box
ABSORBED = 2    # killed by the reflectance roulette at a wall hit
SUSPENDED = 3   # hit the bounce limit (ray->Suspend() guard)


class TraceResult(NamedTuple):
    """SoA trace output for a batch of N rays."""

    status: jax.Array        # [N] int32, one of the codes above
    last_point: jax.Array    # Vec3 [N] — ARay::GetLastPoint
    seg_start: jax.Array     # Vec3 [N] — second-to-last point (segment start)
    direction: jax.Array     # Vec3 [N] — final unit direction
    n_bounces: jax.Array     # [N] int32 — wall interactions before death
    history: jax.Array | None = None        # [K, N, 3] optional path points
    history_len: jax.Array | None = None    # [N] int32 number of valid points

    def exited_port_mask(self, exit_port_z=-100.0):
        """The reference's exit test: last point z < exitPortZ
        (``fluxAtObserver.C:162-166``) — applied to geometric exits."""
        return (self.status == EXITED) & (self.last_point.z < exit_port_z)


def _source_rays(source: Source, n: int, dtype) -> tuple[Vec3, Vec3]:
    shape = (n,)
    pos = Vec3(
        jnp.broadcast_to(jnp.asarray(source.x, dtype), shape),
        jnp.broadcast_to(jnp.asarray(source.y, dtype), shape),
        jnp.broadcast_to(jnp.asarray(source.z, dtype), shape),
    )
    d = Vec3(
        jnp.broadcast_to(jnp.asarray(source.dir_x, dtype), shape),
        jnp.broadcast_to(jnp.asarray(source.dir_y, dtype), shape),
        jnp.broadcast_to(jnp.asarray(source.dir_z, dtype), shape),
    ).normalized()
    return pos, d


def make_bounce_step(key: jax.Array, scene: SphereScene, n_rays: int,
                     cfg: TraceConfig):
    """Build the shared per-iteration bounce step.

    carry = (pos: Vec3, direction: Vec3, prev: Vec3, status: [N] i32,
    bounces: [N] i32, in_gap: [N] bool); ``step(it, carry) -> carry``.

    Physics per iteration (one surface event per lane):

    * interior lanes: advance to the inner shell; port-cap test; with
      ``scene.exact_rim`` an escaping flight that clips the shell's conical
      rim face (theta == theta_max, r in [inner, outer] — the TGeoSphere
      theta-range boundary) reflects there (Lambertian + roulette, like any
      mirror surface in ROBAST) and the lane moves to the GAP region;
      otherwise escape to the world box / wall bounce / roulette absorption.
    * gap lanes (between the shell radii on the hole side): nearest of
      {rim cone (reflect), inner sphere (re-enter the interior through the
      cap), outer sphere (escape outward to the box)}.

    ~4.6% of escaping rays clip the rim at port 170 deg; modelling it moves
    the exit fractions from the top of the corpus ranges onto their centres
    (see docs/PARITY.md).
    """
    from .geometry import cone_crossing_t, cone_face_normal, sphere_crossing_t
    from .sampling import cosine_hemisphere

    dtype = cfg.dtype
    radius = jnp.asarray(scene.inner_radius, dtype)
    r_out = jnp.asarray(scene.outer_radius, dtype)
    theta_max = jnp.deg2rad(jnp.asarray(scene.theta_max_deg, dtype))
    cos_tm = jnp.cos(theta_max)
    cos_cap = radius * cos_tm
    reflectance = jnp.asarray(scene.reflectance, dtype)
    world_half = jnp.asarray(scene.world_half, dtype)
    exact_rim = bool(scene.exact_rim)
    max_iters = int(scene.max_bounces)
    INF = 1e30

    def step(it, carry):
        pos, direction, prev, status, bounces, in_gap = carry
        # `it < max_iters` keeps a partial trailing block of iterations from
        # overshooting the SetLimit bounce cap.
        active = (status == RUNNING) & (it < max_iters)

        k_it = jax.random.fold_in(key, it)
        k_surv, k_scat, k_rim = jax.random.split(k_it, 3)
        survive = (
            jax.random.uniform(k_surv, (n_rays,), dtype) < reflectance
        )

        # ---- interior physics (valid for ~in_gap lanes) -------------------
        q = sphere_hit(pos, direction, radius)
        escaped = q.z < cos_cap  # in_port_cap inlined (q is on the sphere)
        normal = q.scale(-1.0 / radius)
        new_dir = scatter(k_scat, scene.surface_model, direction, normal,
                          scene)
        t_box = ray_box_exit_t(pos, direction, world_half)
        box_pt = pos + direction.scale(t_box)

        if not exact_rim:
            new_status = jnp.where(
                escaped, EXITED, jnp.where(survive, RUNNING, ABSORBED)
            ).astype(jnp.int32)
            status = jnp.where(active, new_status, status)
            prev = Vec3.where(active, pos, prev)
            pos = Vec3.where(active, Vec3.where(escaped, box_pt, q), pos)
            direction = Vec3.where(active & ~escaped & survive, new_dir,
                                   direction)
            bounces = jnp.where(active & ~escaped, bounces + 1, bounces)
            return pos, direction, prev, status, bounces, in_gap

        # ---- rim handling --------------------------------------------------
        interior = active & ~in_gap
        gap = active & in_gap

        # escaping interior flights: rim-cone clip check (from q outward)
        s_rim_i = cone_crossing_t(q, direction, cos_tm, radius, r_out, INF)
        rim_i = escaped & (s_rim_i < INF)
        pc_i = q + direction.scale(s_rim_i)

        # gap propagation: nearest of cone / inner sphere / outer sphere
        s_cone = cone_crossing_t(pos, direction, cos_tm, radius, r_out, INF)
        s_in = sphere_crossing_t(pos, direction, radius, INF)
        s_outs = sphere_crossing_t(pos, direction, r_out, INF)
        gap_cone = gap & (s_cone < s_in) & (s_cone < s_outs)
        gap_enter = gap & ~gap_cone & (s_in < s_outs)
        gap_exit = gap & ~gap_cone & ~gap_enter & (s_outs < INF)
        gap_stuck = gap & ~gap_cone & ~gap_enter & ~gap_exit
        pc_g = pos + direction.scale(s_cone)
        enter_pt = pos + direction.scale(s_in)
        enter_pt = enter_pt.scale(radius * jax.lax.rsqrt(enter_pt.norm2()))

        # one cosine draw about the rim-face normal serves whichever rim
        # event (interior clip or gap cone hit) the lane took
        rim_pt = Vec3.where(in_gap, pc_g, pc_i)
        rim_dir = cosine_hemisphere(k_rim, cone_face_normal(rim_pt))

        rim_bounce = (interior & rim_i) | gap_cone
        exits = (interior & escaped & ~rim_i) | gap_exit
        wall = interior & ~escaped
        absorbed = ((rim_bounce | wall) & ~survive)

        new_status = jnp.where(
            exits, EXITED,
            jnp.where(absorbed, ABSORBED,
                      jnp.where(gap_stuck, SUSPENDED, RUNNING))
        ).astype(jnp.int32)
        status = jnp.where(active, new_status, status)

        upd = active & ~gap_stuck
        prev = Vec3.where(upd, pos, prev)
        new_pos = Vec3.where(
            exits, box_pt,
            Vec3.where(rim_bounce, rim_pt,
                       Vec3.where(gap_enter, enter_pt, q)))
        pos = Vec3.where(upd, new_pos, pos)
        new_d = Vec3.where(rim_bounce, rim_dir, new_dir)
        direction = Vec3.where(upd & (rim_bounce | wall) & survive, new_d,
                               direction)
        bounces = jnp.where(upd & (rim_bounce | wall), bounces + 1, bounces)
        in_gap = jnp.where(
            active, (rim_bounce & survive) | (gap & ~gap_enter & ~exits
                                              & ~absorbed & ~gap_stuck),
            in_gap)
        return pos, direction, prev, status, bounces, in_gap

    return step


def trace_rays(
    key: jax.Array,
    scene: SphereScene,
    source: Source,
    n_rays: int,
    cfg: TraceConfig = TraceConfig(),
) -> TraceResult:
    """Trace ``n_rays`` from ``source`` through ``scene`` to completion.

    Equivalent of filling an ``ARayArray`` and calling
    ``TraceNonSequential(rayArray)`` (``fluxAtObserverOptimize.C:286-295``),
    but the batch IS the parallelism — shard the call with ``shard_map`` over
    a device mesh for the multi-chip version (see ``altair_tpu.parallel``).

    jit-compatible; ``n_rays`` and ``cfg`` are static.
    """
    dtype = cfg.dtype
    pos, direction = _source_rays(source, n_rays, dtype)

    status0 = jnp.zeros((n_rays,), jnp.int32)
    bounces0 = jnp.zeros((n_rays,), jnp.int32)

    keep_hist = int(cfg.keep_history)
    if keep_hist:
        hist0 = jnp.zeros((keep_hist, n_rays, 3), dtype)
        hist0 = hist0.at[0].set(pos.stack())
        hlen0 = jnp.ones((n_rays,), jnp.int32)
    else:
        # history is dropped from the carry entirely (zero-size arrays
        # break sharding propagation under shard_map)
        hist0 = ()
        hlen0 = ()

    max_iters = int(scene.max_bounces)
    step = make_bounce_step(key, scene, n_rays, cfg)

    def bounce_once(it, carry):
        pos, direction, prev, status, bounces, in_gap, hist, hlen = carry
        rec = (status == RUNNING) & (it < max_iters)
        (pos, direction, prev, status, bounces, in_gap) = step(
            it, (pos, direction, prev, status, bounces, in_gap))

        if keep_hist:
            slot = jnp.minimum(hlen, keep_hist - 1)
            hist = hist.at[slot, jnp.arange(n_rays)].set(
                jnp.where(rec[:, None], pos.stack(),
                          hist[slot, jnp.arange(n_rays)])
            )
            hlen = jnp.where(rec, jnp.minimum(hlen + 1, keep_hist), hlen)
            return pos, direction, prev, status, bounces, in_gap, hist, hlen
        return pos, direction, prev, status, bounces, in_gap, (), ()

    block = max(1, min(int(cfg.block_iters), max_iters))

    def cond(state):
        it, carry = state
        return (it < max_iters) & jnp.any(carry[3] == RUNNING)

    def body(state):
        it, carry = state
        # A block of bounces between alive-checks amortises the while_loop
        # condition reduction (the one sync point in the kernel).
        def inner(j, c):
            return bounce_once(it + j, c)

        carry = jax.lax.fori_loop(0, block, inner, carry)
        return it + block, carry

    prev0 = pos
    in_gap0 = jnp.zeros((n_rays,), bool)
    init = (0, (pos, direction, prev0, status0, bounces0, in_gap0, hist0,
                hlen0))
    _, (pos, direction, prev, status, bounces, _, hist, hlen) = (
        jax.lax.while_loop(cond, body, init)
    )

    # Rays still running after the cap are suspended (the reference's
    # ray->Suspend() guard at fluxAtObserverOptimize.C:271-273).
    status = jnp.where(status == RUNNING, SUSPENDED, status)

    return TraceResult(
        status=status,
        last_point=pos,
        seg_start=prev,
        direction=direction,
        n_bounces=bounces,
        history=hist if keep_hist else None,
        history_len=hlen if keep_hist else None,
    )


@partial(jax.jit, static_argnames=("n_rays", "cfg"))
def trace_rays_jit(key, scene, source, n_rays, cfg=TraceConfig()):
    return trace_rays(key, scene, source, n_rays, cfg)


def exit_count(result: TraceResult, exit_port_z=-100.0) -> jax.Array:
    """Number of rays whose last point passed the port-z test — the flux
    counter of ``makeIntegratingSphereNRays.C:74-78,93``."""
    return jnp.sum(result.exited_port_mask(exit_port_z))
