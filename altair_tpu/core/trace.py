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
from .geometry import (
    Vec3,
    in_port_cap,
    ray_box_exit_t,
    sphere_hit,
)
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

    radius = jnp.asarray(scene.inner_radius, dtype)
    theta_max = jnp.deg2rad(jnp.asarray(scene.theta_max_deg, dtype))
    cos_cap = radius * jnp.cos(theta_max)
    reflectance = jnp.asarray(scene.reflectance, dtype)
    world_half = jnp.asarray(scene.world_half, dtype)

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

    def bounce_once(it, carry):
        pos, direction, prev, status, bounces, hist, hlen = carry
        # `it < max_iters` keeps the last (partial) block of bounce
        # iterations from overshooting the SetLimit bounce cap.
        active = (status == RUNNING) & (it < max_iters)

        # Advance to the inner shell surface (the only optical surface).
        q = sphere_hit(pos, direction, radius)
        escaped = q.z < cos_cap  # in_port_cap inlined (q is on the sphere)

        # Reflectance roulette (AMirror::SetReflectance as per-bounce
        # survival, fluxAtObserverOptimize.C:206).
        k_it = jax.random.fold_in(key, it)
        k_surv, k_scat = jax.random.split(k_it)
        survive = (
            jax.random.uniform(k_surv, (n_rays,), dtype) < reflectance
        )

        # Scatter about the inward normal -q/r at the wall.
        normal = q.scale(-1.0 / radius)
        new_dir = scatter(k_scat, scene.surface_model, direction, normal,
                          scene)

        # Escaped rays fly from their departure point to the world box.
        t_box = ray_box_exit_t(pos, direction, world_half)
        box_pt = pos + direction.scale(t_box)

        new_status = jnp.where(
            escaped, EXITED, jnp.where(survive, RUNNING, ABSORBED)
        ).astype(jnp.int32)

        status = jnp.where(active, new_status, status)
        upd = active  # lanes whose state advances this iteration
        prev = Vec3.where(upd, pos, prev)
        pos = Vec3.where(upd, Vec3.where(escaped, box_pt, q), pos)
        direction = Vec3.where(upd & ~escaped & survive, new_dir, direction)
        bounces = jnp.where(upd & ~escaped, bounces + 1, bounces)

        if keep_hist:
            slot = jnp.minimum(hlen, keep_hist - 1)
            rec = upd
            hist = hist.at[slot, jnp.arange(n_rays)].set(
                jnp.where(rec[:, None], pos.stack(), hist[slot, jnp.arange(n_rays)])
            )
            hlen = jnp.where(rec, jnp.minimum(hlen + 1, keep_hist), hlen)
            return pos, direction, prev, status, bounces, hist, hlen
        return pos, direction, prev, status, bounces, (), ()

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
    init = (0, (pos, direction, prev0, status0, bounces0, hist0, hlen0))
    _, (pos, direction, prev, status, bounces, hist, hlen) = (
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
