"""Two-stage scatter-retrace pipeline — the *current* ``nonLambertianFlux.C``
methodology (``:235-304``), distinct from putting the BRDF inside the bounce
loop (the archived macro / ``SurfaceModel`` wall models):

  1. trace each ray through the Lambertian sphere to completion,
  2. take its END POINT, compute the sphere normal there as
     ``endpoint.Unit()`` (the macro's simplification — note: the OUTWARD
     normal, and applied wherever the ray died, ``:254-259``),
  3. sample ONE custom-BRDF scatter of the original source direction about
     that normal (``gBRDF.SampleDirection(normal, incidentDir)`` uses the
     ray's INITIAL direction as incident, ``:244-247,262``),
  4. re-trace the scattered ray from the endpoint,
  5. score exit/detector on the SCATTERED ray (``:294-297``).

Faithful quirks preserved: the outward ``endpoint.Unit()`` normal, the
initial-direction incident vector, and re-tracing from endpoints that may
lie outside the sphere (exited rays' box endpoints) — flagged via
``only_rescatter_absorbed`` to optionally restrict stage 2 to endpoints on
the shell (the physically-meaningful subset).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorGrid, SphereScene, Source, TraceConfig
from ..core.geometry import Vec3
from ..core.sampling import mixed_brdf
from ..core.score import fluxmap_trace_once
from ..core.trace import EXITED, RUNNING, TraceResult, trace_rays


def _retrace_from(key, scene, pos: Vec3, direction: Vec3, n_rays, cfg):
    """Continue rays from arbitrary interior points/directions — the second
    ``TraceNonSequential`` call of the macro.  Implemented by running the
    bounce loop with a custom initial state."""
    from ..core.geometry import in_port_cap, ray_box_exit_t, sphere_hit
    from ..core.sampling import scatter

    dtype = cfg.dtype
    radius = jnp.asarray(scene.inner_radius, dtype)
    theta_max = jnp.deg2rad(jnp.asarray(scene.theta_max_deg, dtype))
    cos_cap = radius * jnp.cos(theta_max)
    reflectance = jnp.asarray(scene.reflectance, dtype)
    world_half = jnp.asarray(scene.world_half, dtype)

    # points outside the sphere (|p| > r) fly straight to the box: treat as
    # exited if their forward path has z < exit threshold
    inside = pos.norm2() < radius * radius
    status0 = jnp.where(inside, RUNNING, EXITED).astype(jnp.int32)

    def bounce_once(it, carry):
        pos, direction, prev, status, bounces = carry
        active = status == RUNNING
        q = sphere_hit(pos, direction, radius)
        escaped = q.z < cos_cap
        k_it = jax.random.fold_in(key, it)
        k_surv, k_scat = jax.random.split(k_it)
        survive = jax.random.uniform(k_surv, (n_rays,), dtype) < reflectance
        normal = q.scale(-1.0 / radius)
        new_dir = scatter(k_scat, scene.surface_model, direction, normal,
                          scene)
        t_box = ray_box_exit_t(pos, direction, world_half)
        box_pt = pos + direction.scale(t_box)
        new_status = jnp.where(escaped, EXITED,
                               jnp.where(survive, RUNNING, 2)).astype(
                                   jnp.int32)
        status_new = jnp.where(active, new_status, status)
        prev = Vec3.where(active, pos, prev)
        pos = Vec3.where(active, Vec3.where(escaped, box_pt, q), pos)
        direction = Vec3.where(active & ~escaped & survive, new_dir,
                               direction)
        bounces = jnp.where(active & ~escaped, bounces + 1, bounces)
        return pos, direction, prev, status_new, bounces

    # outside-sphere starts: propagate straight to the box
    t_box0 = ray_box_exit_t(pos, direction, world_half)
    box0 = pos + direction.scale(t_box0)
    prev0 = pos
    pos = Vec3.where(inside, pos, box0)

    max_iters = int(scene.max_bounces)
    block = max(1, min(32, max_iters))

    def cond(state):
        it, carry = state
        return (it < max_iters) & jnp.any(carry[3] == RUNNING)

    def body(state):
        it, carry = state
        carry = jax.lax.fori_loop(0, block, lambda j, c: bounce_once(
            it + j, c), carry)
        return it + block, carry

    bounces0 = jnp.zeros((n_rays,), jnp.int32)
    _, (pos, direction, prev, status, bounces) = jax.lax.while_loop(
        cond, body, (0, (pos, direction, prev0, status0, bounces0)))
    status = jnp.where(status == RUNNING, 3, status)
    return TraceResult(status, pos, prev, direction, bounces)


def trace_scatter_retrace(
    key: jax.Array,
    scene: SphereScene,
    source: Source,
    n_rays: int,
    cfg: TraceConfig = TraceConfig(),
    only_rescatter_absorbed: bool = False,
) -> TraceResult:
    """The full two-stage pipeline; returns the SCATTERED rays' TraceResult
    (what the macro scores)."""
    k1, k2, k3 = jax.random.split(key, 3)
    first = trace_rays(k1, scene, source, n_rays, cfg)

    endpoint = first.last_point
    normal = endpoint.normalized()           # endpoint.Unit()  (:259)
    incident = Vec3.full((n_rays,), (0.0, 0.0, 0.0))
    dnorm = float(np.sqrt(float(source.dir_x) ** 2 + float(source.dir_y) ** 2
                          + float(source.dir_z) ** 2))
    incident = Vec3(
        jnp.full((n_rays,), float(source.dir_x) / dnorm, cfg.dtype),
        jnp.full((n_rays,), float(source.dir_y) / dnorm, cfg.dtype),
        jnp.full((n_rays,), float(source.dir_z) / dnorm, cfg.dtype),
    )
    new_dir = mixed_brdf(k2, incident, normal, scene.specular_prob,
                         scene.diffuse_prob, scene.brdf_roughness)

    if only_rescatter_absorbed:
        on_shell = jnp.abs(endpoint.norm() - scene.inner_radius) < 1.0
        new_dir = Vec3.where(on_shell, new_dir, first.direction)

    return _retrace_from(k3, scene, endpoint, new_dir, n_rays, cfg)


@dataclasses.dataclass
class ScatterRetraceSweep:
    fluxmap: np.ndarray
    n_rays: int
    wall_time_s: float


def sweep_scatter_retrace(
    scene: SphereScene,
    source: Source,
    *,
    n_rays: int = 100_000,
    grid: DetectorGrid = DetectorGrid(n_theta=45, n_phi=20, width=10.0,
                                      height=10.0),
    seed: int = 0,
    cfg: TraceConfig = TraceConfig(),
) -> ScatterRetraceSweep:
    """``sweepDetector`` of nonLambertianFlux.C (``:307-387``): 45x20 grid,
    10x10 cm detector, 100k rays, scored on the scattered rays.  TPU-first:
    one trace+rescatter+score call instead of re-tracing per position."""
    t0 = time.perf_counter()

    @jax.jit
    def run(key):
        res = trace_scatter_retrace(key, scene, source, n_rays, cfg)
        return fluxmap_trace_once(res, grid, scene.exit_port_z)

    counts = np.asarray(run(jax.random.key(seed)))
    return ScatterRetraceSweep(counts / n_rays, n_rays,
                               time.perf_counter() - t0)
