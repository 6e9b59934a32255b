"""Sharding layer on the 8-device virtual CPU mesh (SURVEY.md §4.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altair_tpu import DetectorGrid, SCENE_OPTIMIZE, SOURCE_OVERNIGHT, TraceConfig
from altair_tpu.core.score import fluxmap_trace_once
from altair_tpu.core.trace import trace_rays
from altair_tpu.parallel import (
    make_mesh,
    sharded_exit_histogram,
    sharded_fluxmap,
    sharded_param_sweep,
)
from altair_tpu.sweep.series import stack_scenes

pytestmark = pytest.mark.slow  # 8-device-mesh consistency sweeps


SCENE = SCENE_OPTIMIZE.with_(max_bounces=1024)
CFG = TraceConfig(block_iters=16)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


class TestShardedFluxmap:
    def test_runs_and_matches_single_device(self, mesh):
        grid = DetectorGrid(n_theta=6, n_phi=4)
        n = 16_000
        counts, n_exit = sharded_fluxmap(
            mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT, grid, n, CFG)
        counts = np.asarray(counts)
        assert counts.shape == (6, 4)
        assert counts.sum() > 0
        frac_exit = int(n_exit) / n
        assert 0.40 < frac_exit < 0.45

        # statistically consistent with the unsharded path
        res = trace_rays(jax.random.key(1), SCENE, SOURCE_OVERNIGHT, n, CFG)
        ref = np.asarray(fluxmap_trace_once(res, grid))
        sigma = np.sqrt(np.maximum(ref, 1)) * 4 + 10
        assert (np.abs(counts - ref) < sigma).all()

    def test_mesh_size_division_check(self, mesh):
        with pytest.raises(ValueError):
            sharded_fluxmap(mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                            DetectorGrid(n_theta=2, n_phi=2), 1001, CFG)

    def test_deterministic_per_key(self, mesh):
        # same (grid, n) as test_runs_and_matches_single_device so the
        # memoized program is a cache hit — this test pays no compile
        grid = DetectorGrid(n_theta=6, n_phi=4)
        a, _ = sharded_fluxmap(mesh, jax.random.key(3), SCENE,
                               SOURCE_OVERNIGHT, grid, 16_000, CFG)
        b, _ = sharded_fluxmap(mesh, jax.random.key(3), SCENE,
                               SOURCE_OVERNIGHT, grid, 16_000, CFG)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shards_are_independent_streams(self, mesh):
        """Different shards must not replay the same ray sequence: identical
        streams would give identical per-shard exit counts — astronomically
        unlikely for 8 independent 1k-ray binomials.  (Checks the per-shard
        counts directly; an earlier version compared the psum TOTAL against
        8x a lone trace, which can collide by coincidence — it did, once.)"""
        from functools import partial

        from jax.sharding import PartitionSpec as P

        from altair_tpu.parallel.mesh import (
            RAY_AXIS,
            _per_shard_key,
            _pick_tracer,
            scene_spec,
        )

        n_local = 1_000
        tracer = _pick_tracer(SCENE, n_local, CFG)

        @jax.jit  # eager shard_map dispatch is ~7x slower to lower
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), scene_spec(SCENE), P()),
                 out_specs=P(RAY_AXIS), check_vma=False)
        def per_shard_exits(key, scene, src):
            k = _per_shard_key(key, RAY_AXIS)
            res = tracer(k, scene, src, n_local, CFG)
            return res.exited_port_mask(scene.exit_port_z).sum(
                dtype=jnp.int32)[None]

        counts = np.asarray(per_shard_exits(jax.random.key(5), SCENE,
                                            SOURCE_OVERNIGHT))
        assert counts.shape == (8,)
        assert len(np.unique(counts)) > 1, counts


class TestShardedHistogram:
    def test_histogram_total(self, mesh):
        hist, n_exit = sharded_exit_histogram(
            mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT, 16_000, CFG)
        hist = np.asarray(hist)
        assert hist.shape == (180,)
        assert hist.sum() <= int(n_exit)
        assert hist.sum() > 0.9 * int(n_exit)


class TestParamSweep:
    def test_port_angle_batch(self, mesh):
        ports = jnp.array([160.0, 170.0], jnp.float32)
        scenes = stack_scenes(SCENE, theta_max_deg=ports)
        counts = sharded_param_sweep(
            mesh, jax.random.key(0), scenes, SOURCE_OVERNIGHT, 16_000, CFG)
        fr = np.asarray(counts) / 16_000
        assert abs(fr[0] - 0.748) < 0.015
        assert abs(fr[1] - 0.425) < 0.015

    def test_fluxmaps_match_single_device_series(self, mesh):
        """With a grid, the sharded series returns per-scene flux maps
        statistically consistent with run_series_vmapped (SURVEY §2.3.5's
        multi-chip claim, made fluxmap-capable)."""
        from altair_tpu.sweep.series import run_series_vmapped

        ports = [164.0, 170.0]
        grid = DetectorGrid(n_theta=4, n_phi=3)
        n = 16_000
        scenes = stack_scenes(SCENE, theta_max_deg=jnp.asarray(ports))
        maps, exits = sharded_param_sweep(
            mesh, jax.random.key(2), scenes, SOURCE_OVERNIGHT, n, CFG,
            grid=grid)
        maps = np.asarray(maps)
        assert maps.shape == (2, 4, 3)
        ref_maps, ref_exits = run_series_vmapped(
            SCENE, SOURCE_OVERNIGHT, port_angles=ports, n_rays=n, grid=grid,
            seed=7, cfg=CFG)
        sigma = np.sqrt(np.maximum(ref_maps, 1)) * 4 + 10
        assert (np.abs(maps - ref_maps) < sigma).all()
        assert np.abs(np.asarray(exits) - ref_exits).max() < 4 * np.sqrt(
            0.7 * 0.3 * n) * 2 + 20


class TestSourceSweep:
    """Source-batched sharded series (VERDICT r4 #8): the srcX/Y/Z axis of
    sweepSeries as a mesh route."""

    def test_sources_route_matches_scenes_route_exactly(self, mesh):
        """Identical members through the two batch axes must agree
        bit-for-bit: the scenes route with two identical ports and the
        sources route with two identical sources run the same per-member
        fold/tracer/score."""
        from altair_tpu.sweep.series import stack_sources

        n = 16_000
        scenes = stack_scenes(SCENE,
                              theta_max_deg=jnp.array([170.0, 170.0]))
        a = sharded_param_sweep(
            mesh, jax.random.key(3), scenes, SOURCE_OVERNIGHT, n, CFG)
        srcs = stack_sources(SOURCE_OVERNIGHT,
                             x=jnp.full((2,), SOURCE_OVERNIGHT.x))
        b = sharded_param_sweep(
            mesh, jax.random.key(3), SCENE, SOURCE_OVERNIGHT, n, CFG,
            sources=srcs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_source_positions_physics(self, mesh):
        """Moving the source must not move the Lambertian exit fraction
        (the chain law depends only on the port and reflectance)."""
        from altair_tpu.sweep.series import stack_sources

        n = 16_000
        srcs = stack_sources(SOURCE_OVERNIGHT,
                             x=jnp.array([-60.0, -40.0]),
                             z=jnp.array([-60.0, -75.0]))
        exits = np.asarray(sharded_param_sweep(
            mesh, jax.random.key(4), SCENE, SOURCE_OVERNIGHT, n, CFG,
            sources=srcs))
        for e in exits:
            assert abs(e / n - 0.425) < 0.015, exits

    def test_zip_path_validates_member_pairs(self, mesh):
        """The zipped scenes+sources path must fail fast on an exterior
        source member — validate() on the batched pytree would silently
        skip the radius check (review r5 #1)."""
        from altair_tpu.sweep.series import stack_sources

        scenes = stack_scenes(SCENE,
                              theta_max_deg=jnp.array([170.0, 170.0]))
        bad = stack_sources(SOURCE_OVERNIGHT,
                            x=jnp.array([-60.0, -80.0]))  # member 1 r=109.7
        with pytest.raises(ValueError, match="outside the sphere"):
            sharded_param_sweep(mesh, jax.random.key(0), scenes,
                                SOURCE_OVERNIGHT, 16_000, CFG, sources=bad)

    def test_zip_length_contract(self, mesh):
        from altair_tpu.sweep.series import stack_sources

        scenes = stack_scenes(SCENE, theta_max_deg=jnp.array([170.0]))
        srcs = stack_sources(SOURCE_OVERNIGHT,
                             x=jnp.array([-50.0, -40.0]))
        with pytest.raises(ValueError, match="equal length"):
            sharded_param_sweep(mesh, jax.random.key(0), scenes,
                                SOURCE_OVERNIGHT, 16_000, CFG, sources=srcs)


class TestShardedRetrace:
    def test_matches_single_device_retrace(self, mesh):
        """Multi-chip fresh-rays-per-position sweep vs the single-chip
        fluxmap_retrace on the same grid (independent streams, counts are
        binomial per position)."""
        from altair_tpu.core.score import fluxmap_retrace
        from altair_tpu.parallel import sharded_retrace

        grid = DetectorGrid(n_theta=3, n_phi=2)
        n_per_pos = 4_000
        counts = np.asarray(sharded_retrace(
            mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT, grid,
            n_per_pos, CFG))
        assert counts.shape == (3, 2)
        ref = np.asarray(jax.jit(
            lambda k: fluxmap_retrace(k, SCENE, SOURCE_OVERNIGHT, grid,
                                      n_per_pos, CFG))(jax.random.key(1)))
        sigma = np.sqrt(np.maximum(ref, 1)) * 4 + 12
        assert (np.abs(counts - ref) < sigma).all()

    def test_division_check(self, mesh):
        from altair_tpu.parallel import sharded_retrace

        with pytest.raises(ValueError):
            sharded_retrace(mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                            DetectorGrid(n_theta=2, n_phi=2), 1001, CFG)

    def test_binomial_matches_single_device(self, mesh):
        """Sharded binomial retrace (shared sample split over chips, one
        psum, replicated draws) vs the single-device engine: same error
        contract, so maps agree within the binomial band."""
        from altair_tpu.core.score import fluxmap_retrace_binomial
        from altair_tpu.parallel import sharded_retrace_binomial

        grid = DetectorGrid(n_theta=3, n_phi=2)
        n_per_pos = 4_000
        counts = np.asarray(sharded_retrace_binomial(
            mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT, grid,
            n_per_pos, CFG, oversample=16))
        assert counts.shape == (3, 2)
        assert (counts >= 0).all() and (counts <= n_per_pos).all()
        ref = np.asarray(jax.jit(
            lambda k: fluxmap_retrace_binomial(
                k, SCENE, SOURCE_OVERNIGHT, grid, n_per_pos, CFG,
                oversample=16))(jax.random.key(1)))
        sigma = np.sqrt(np.maximum(ref, 1)) * 4 + 12
        assert (np.abs(counts - ref) < sigma).all()


class TestShardedBinomialValidation:
    def test_oversample_check(self, mesh):
        from altair_tpu.parallel import sharded_retrace_binomial

        with pytest.raises(ValueError):
            sharded_retrace_binomial(
                mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT,
                DetectorGrid(n_theta=2, n_phi=2), 4_000, CFG, oversample=1)

    def test_param_sweep_direct_contract(self):
        from altair_tpu.config import SurfaceModel
        from altair_tpu.parallel.mesh import _param_sweep_tracer

        spec = stack_scenes(SCENE.with_(surface_model=SurfaceModel.SPECULAR),
                            theta_max_deg=jnp.array([170.0]))
        with pytest.raises(NotImplementedError):
            _param_sweep_tracer(spec, TraceConfig(engine="direct"))


class TestParamSweepDispatch:
    def test_direct_engine_planned_from_concrete_members(self):
        """sharded_param_sweep must dispatch the direct sampler when every
        concrete member admits it (the plain-kernel fallback was PROGRESS
        r2 gap #4)."""
        from altair_tpu.core.trace import trace_rays as plain
        from altair_tpu.parallel.mesh import _param_sweep_tracer

        scenes = stack_scenes(SCENE, theta_max_deg=jnp.array([164.0, 170.0]))
        t = _param_sweep_tracer(scenes, CFG)
        assert t is not plain
        t_sim = _param_sweep_tracer(scenes, TraceConfig(engine="simulate"))
        assert t_sim is plain
        thick = stack_scenes(SCENE.with_(outer_radius=105.0,
                                         reflectance=1.0),
                             theta_max_deg=jnp.array([170.0]))
        assert _param_sweep_tracer(thick, CFG) is plain


class TestShardedWaves:
    def test_waves_engine_inside_shard_map(self, mesh, monkeypatch):
        """The wave-compaction tracer must compile and run INSIDE shard_map
        (nonzero/gather/scatter + psum composition) — regression for the
        engine selection happening on the concrete scene at closure time."""
        from altair_tpu.parallel import mesh as pm

        monkeypatch.setattr(pm, "WAVES_THRESHOLD", 1024)
        grid = DetectorGrid(n_theta=3, n_phi=2)
        counts, n_exit = sharded_fluxmap(
            mesh, jax.random.key(0), SCENE, SOURCE_OVERNIGHT, grid,
            16_000, CFG)
        frac = int(n_exit) / 16_000
        assert 0.40 < frac < 0.45, frac
        assert np.asarray(counts).sum() > 0


class TestShardedInsphere:
    """Multi-chip in-sphere focal-disk sweep (VERDICT r2 #6) vs the
    single-device sweep_insphere_detector on identical placements."""

    def _run(self, mesh, retrace):
        from altair_tpu import SCENE_INSPHERE
        from altair_tpu.sweep.insphere import sweep_insphere_detector

        scene = SCENE_INSPHERE.with_(max_bounces=512)
        kw = dict(disk_radius=5.0, n_rays=16_000, dtheta=15.0,
                  theta_max=30.0, dphi=180.0, save_path=None,
                  cfg=CFG, retrace=retrace)
        sh = sweep_insphere_detector(scene, SOURCE_OVERNIGHT, mesh=mesh,
                                     seed=0, **kw)
        ref = sweep_insphere_detector(scene, SOURCE_OVERNIGHT, mesh=None,
                                      seed=1, **kw)
        assert sh.fractions.shape == ref.fractions.shape
        assert sh.fractions.sum() > 0
        n = kw["n_rays"]
        sigma = 4 * np.sqrt(np.maximum(ref.fractions * n, 1)) + 12
        assert (np.abs(sh.fractions * n - ref.fractions * n) < sigma).all()

    def test_trace_once_matches_single_device(self, mesh):
        self._run(mesh, retrace=False)

    def test_retrace_matches_single_device(self, mesh):
        self._run(mesh, retrace=True)

    def test_division_check(self, mesh):
        from altair_tpu import SCENE_INSPHERE
        from altair_tpu.parallel import sharded_insphere

        with pytest.raises(ValueError):
            sharded_insphere(mesh, jax.random.key(0), SCENE_INSPHERE,
                             SOURCE_OVERNIGHT,
                             np.zeros((2, 3), np.float32),
                             np.tile(np.array([0, 0, 1.0], np.float32),
                                     (2, 1)),
                             5.0, 1001, CFG)


class TestShardedScatterRetrace:
    """Multi-chip two-stage scatter-retrace (VERDICT r2 #6 tail) vs the
    single-device sweep on an identical configuration."""

    def test_matches_single_device(self, mesh):
        from altair_tpu.sweep.scatter_retrace import sweep_scatter_retrace

        scene = SCENE.with_(specular_prob=0.3, diffuse_prob=0.4,
                            brdf_roughness=0.6)
        grid = DetectorGrid(n_theta=9, n_phi=4, width=10.0, height=10.0)
        kw = dict(n_rays=16_000, grid=grid, cfg=CFG)
        sh = sweep_scatter_retrace(scene, SOURCE_OVERNIGHT, mesh=mesh,
                                   seed=0, **kw)
        ref = sweep_scatter_retrace(scene, SOURCE_OVERNIGHT, mesh=None,
                                    seed=1, **kw)
        assert sh.fluxmap.shape == ref.fluxmap.shape == (9, 4)
        assert sh.fluxmap.sum() > 0
        n = kw["n_rays"]
        sigma = 4 * np.sqrt(np.maximum(ref.fluxmap * n, 1)) + 10
        assert (np.abs(sh.fluxmap * n - ref.fluxmap * n) < sigma).all()

    def test_division_check(self, mesh):
        from altair_tpu.parallel import sharded_scatter_retrace

        with pytest.raises(ValueError):
            sharded_scatter_retrace(mesh, jax.random.key(0), SCENE,
                                    SOURCE_OVERNIGHT,
                                    DetectorGrid(n_theta=2, n_phi=2),
                                    1001, CFG)


class TestShardedDistribution:
    """Multi-chip exit angular-distribution run: psum-merged histograms,
    ray-sharded direction payload."""

    def test_matches_single_device(self, mesh):
        from altair_tpu.sweep.distribution import run_distribution

        n = 16_000
        sh = run_distribution(SCENE, SOURCE_OVERNIGHT, n_rays=n, seed=0,
                              cfg=CFG, mesh=mesh)
        ref = run_distribution(SCENE, SOURCE_OVERNIGHT, n_rays=n, seed=1,
                               cfg=CFG)
        assert sh.angle_hist.shape == ref.angle_hist.shape
        assert sh.angle_hist.sum() == sh.n_exited
        assert abs(sh.n_exited - ref.n_exited) < 5 * np.sqrt(
            ref.n_exited * (1 - ref.n_exited / n)) + 5
        # direction payload: one row per exited ray, unit vectors
        assert sh.directions.shape == (sh.n_exited, 3)
        np.testing.assert_allclose(
            np.linalg.norm(sh.directions, axis=1), 1.0, atol=1e-4)
        # cos-z histograms statistically consistent
        sigma = 4 * np.sqrt(np.maximum(ref.dz_hist, 1)) + 10
        assert (np.abs(sh.dz_hist.astype(float)
                       - ref.dz_hist.astype(float)) < sigma).all()
