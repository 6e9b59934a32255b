"""Sweep drivers: trace-once / retrace / twofold consistency, CSV output,
series, distribution, in-sphere (SURVEY.md §7.5)."""

import glob
import os

import jax
import numpy as np
import pytest

from altair_tpu import (
    DetectorGrid,
    SCENE_DEMO,
    SCENE_INSPHERE,
    SCENE_OPTIMIZE,
    SOURCE_DEMO,
    SOURCE_OVERNIGHT,
    TraceConfig,
)
from altair_tpu.analysis import expected_exit_fraction
from altair_tpu.io import read_fluxmap
from altair_tpu.sweep import (
    read_detector_sweep,
    run_distribution,
    run_series,
    run_series_vmapped,
    series_folder,
    sweep_detector_retrace,
    sweep_detector_trace_once,
    sweep_detector_twofold,
    sweep_insphere_detector,
    write_angular_dist,
    write_ray_log,
)

pytestmark = pytest.mark.slow  # end-to-end sweep drivers (many full traces)

SCENE = SCENE_OPTIMIZE.with_(max_bounces=2048)
GRID = DetectorGrid(n_theta=12, n_phi=6)


class TestTraceOnceSweep:
    def test_end_to_end_csv(self, tmp_path):
        res = sweep_detector_trace_once(
            SCENE, SOURCE_OVERNIGHT, n_rays=20_000, grid=GRID, seed=0,
            save_folder=str(tmp_path), verbose=False)
        assert os.path.exists(res.path)
        theta, phi, frac, md = read_fluxmap(res.path)
        assert len(theta) == GRID.n_positions
        np.testing.assert_allclose(
            frac.reshape(GRID.n_theta, GRID.n_phi), res.fluxmap, atol=1e-6)
        assert md["Exit port angle"] == "170 degrees"
        assert "Total rays exiting port" in md
        assert 0.41 < res.n_exited / 20_000 < 0.445

    def test_no_save(self):
        res = sweep_detector_trace_once(
            SCENE, SOURCE_OVERNIGHT, n_rays=5_000, grid=GRID, seed=1,
            save_folder=None, verbose=False)
        assert res.path is None
        assert res.fluxmap.shape == (GRID.n_theta, GRID.n_phi)

    def test_footer_phase_times_honest(self, tmp_path):
        """Both footer phases are real measurements: positive, and summing
        to no more than the total (fluxAtObserverFast.C:1374-1382 reports
        trace and sweep separately — VERDICT r1 weak #4)."""
        res = sweep_detector_trace_once(
            SCENE, SOURCE_OVERNIGHT, n_rays=10_000, grid=GRID, seed=2,
            save_folder=str(tmp_path), verbose=False)
        assert res.trace_time_s > 0
        assert res.score_time_s > 0
        assert res.trace_time_s + res.score_time_s <= res.total_time_s + 1e-6
        _, _, _, md = read_fluxmap(res.path)
        assert float(md["Ray tracing time"].split()[0]) > 0
        assert float(md["Detector sweep time"].split()[0]) > 0

    def test_sharded_mesh_path(self, tmp_path):
        """The mesh= path (sharded_trace -> sharded_score_traced) writes the
        same CSV contract with honest phase times."""
        from altair_tpu.parallel import make_mesh

        res = sweep_detector_trace_once(
            SCENE, SOURCE_OVERNIGHT, n_rays=16_000, grid=GRID, seed=3,
            save_folder=str(tmp_path), mesh=make_mesh(), verbose=False)
        assert 0.40 < res.n_exited / 16_000 < 0.45
        assert res.trace_time_s > 0 and res.score_time_s > 0
        theta, _, frac, _ = read_fluxmap(res.path)
        assert len(theta) == GRID.n_positions


class TestRetraceSweep:
    @pytest.mark.slow
    def test_mesh_route_matches_local(self, tmp_path):
        """sweep_detector_retrace(mesh=...) — both engines route through
        the sharded programs and write the same CSV dialect."""
        from altair_tpu.parallel import make_mesh

        mesh = make_mesh()
        grid = DetectorGrid(n_theta=4, n_phi=2)
        kw = dict(n_rays_per_pos=1_600, grid=grid, verbose=False)
        local = sweep_detector_retrace(SCENE, SOURCE_OVERNIGHT, seed=3,
                                       save_folder=None, **kw)
        sh = sweep_detector_retrace(SCENE, SOURCE_OVERNIGHT, seed=4,
                                    save_folder=str(tmp_path), mesh=mesh,
                                    **kw)
        sigma = np.sqrt(np.maximum(local.fluxmap, 1e-6) / 1_600) * 4 + 0.008
        assert (np.abs(sh.fluxmap - local.fluxmap) < sigma).all()
        assert sh.path and sh.path.endswith(".csv")
        shb = sweep_detector_retrace(SCENE, SOURCE_OVERNIGHT, seed=5,
                                     save_folder=None, mesh=mesh,
                                     engine="binomial", oversample=16, **kw)
        assert (np.abs(shb.fluxmap - local.fluxmap) < sigma).all()
        with pytest.raises(ValueError):
            sweep_detector_retrace(SCENE, SOURCE_OVERNIGHT, seed=6,
                                   save_folder=None, mesh=mesh,
                                   resume_path="x.csv", **kw)

    def test_matches_trace_once(self, tmp_path):
        grid = DetectorGrid(n_theta=4, n_phi=2)
        once = sweep_detector_trace_once(
            SCENE, SOURCE_OVERNIGHT, n_rays=40_000, grid=grid, seed=2,
            save_folder=None, verbose=False)
        re = sweep_detector_retrace(
            SCENE, SOURCE_OVERNIGHT, n_rays_per_pos=5_000, grid=grid,
            seed=3, save_folder=str(tmp_path), pos_chunk=2, verbose=False)
        sigma = np.sqrt(np.maximum(once.fluxmap, 1e-6) / 5_000) * 3 + 0.004
        assert (np.abs(re.fluxmap - once.fluxmap) < sigma).all()
        # footer contract
        _, _, _, md = read_fluxmap(re.path)
        assert "Total ray hits" in md


class TestTwofoldSweep:
    def test_matches_trace_once(self):
        grid = DetectorGrid(n_theta=2, n_phi=4)
        once = sweep_detector_trace_once(
            SCENE, SOURCE_OVERNIGHT, n_rays=40_000, grid=grid, seed=4,
            save_folder=None, verbose=False)
        two = sweep_detector_twofold(
            SCENE, SOURCE_OVERNIGHT, n_rays_per_pair=10_000, grid=grid,
            seed=5, save_folder=None, verbose=False)
        sigma = np.sqrt(np.maximum(once.fluxmap, 1e-6) / 10_000) * 3 + 0.004
        assert (np.abs(two.fluxmap - once.fluxmap) < sigma).all()

    @pytest.mark.slow
    def test_mesh_route_matches_local(self):
        from altair_tpu.parallel import make_mesh

        grid = DetectorGrid(n_theta=2, n_phi=4)
        local = sweep_detector_twofold(
            SCENE, SOURCE_OVERNIGHT, n_rays_per_pair=8_000, grid=grid,
            seed=6, save_folder=None, verbose=False)
        sh = sweep_detector_twofold(
            SCENE, SOURCE_OVERNIGHT, n_rays_per_pair=8_000, grid=grid,
            seed=7, save_folder=None, verbose=False, mesh=make_mesh())
        sigma = np.sqrt(np.maximum(local.fluxmap, 1e-6) / 8_000) * 4 + 0.006
        assert (np.abs(sh.fluxmap - local.fluxmap) < sigma).all()


class TestSeries:
    def test_sequential_series_folders(self, tmp_path):
        out = run_series(
            SCENE, SOURCE_OVERNIGHT, port_angles=[164.0], repeats=2,
            n_rays=5_000, grid=DetectorGrid(n_theta=3, n_phi=2),
            save_root=str(tmp_path), seed=0, verbose=False)
        assert len(out) == 2
        folder = os.path.join(
            str(tmp_path), series_folder("portAngleSweep", SOURCE_OVERNIGHT,
                                         164.0))
        files = sorted(glob.glob(os.path.join(folder, "*.csv")))
        assert len(files) == 2
        assert files[1].endswith("_1.csv")  # repeat suffixing

    def test_vmapped_series_exit_fractions(self):
        ports = [160.0, 170.0]
        counts, exits = run_series_vmapped(
            SCENE, SOURCE_OVERNIGHT, port_angles=ports, n_rays=20_000,
            grid=DetectorGrid(n_theta=3, n_phi=2), seed=1)
        assert counts.shape == (2, 3, 2)
        for p, e in zip(ports, exits):
            expect = expected_exit_fraction(p, 0.99)
            assert abs(e / 20_000 - expect) < 0.015, (p, e)

    def test_vmapped_series_uses_direct_engine(self):
        """The batched series must dispatch the same engines as the
        sequential path: the static applicability facts are computed from
        the concrete port list BEFORE batching (PROGRESS r2 gap #4)."""
        from altair_tpu.config import TraceConfig
        from altair_tpu.core.trace import trace_rays as plain
        from altair_tpu.sweep.series import _series_tracer

        ports = [164.0, 170.0]
        t = _series_tracer(SCENE, ports, TraceConfig())
        assert t is not plain  # rim-deferred direct path chosen
        t_sim = _series_tracer(SCENE, ports, TraceConfig(engine="simulate"))
        assert t_sim is plain
        # a member whose rim band is too thick to defer falls back whole
        # (the in-sphere corpus shell: 4.9 cm at reflectance 1 — ~1/3 of
        # escapers clip, beyond the deferral capacity contract)
        thick = SCENE.with_(outer_radius=105.0, reflectance=1.0)
        assert _series_tracer(thick, [170.0], TraceConfig()) is plain

    def test_vmapped_series_specular_scene(self):
        """Non-Lambertian series must not hit the compaction-overflow
        guard (review finding: the Lambertian capacity formula undersized
        the buffer for a near-specular chain whose exit fraction ~ rho)."""
        from altair_tpu.config import SurfaceModel

        scene = SCENE.with_(surface_model=SurfaceModel.SPECULAR,
                            max_bounces=1024)
        counts, exits = run_series_vmapped(
            scene, SOURCE_OVERNIGHT, port_angles=[170.0], n_rays=4_000,
            grid=DetectorGrid(n_theta=2, n_phi=2), seed=9)
        # a specular sphere funnels far more flux out than Lambertian
        assert exits[0] / 4_000 > 0.6

    def test_direct_engine_contract_raises(self):
        """engine='direct' must ERROR when inapplicable, not silently
        downgrade to the simulate kernel (config.py contract)."""
        from altair_tpu.config import SurfaceModel, TraceConfig
        from altair_tpu.sweep.series import _series_tracer

        spec = SCENE.with_(surface_model=SurfaceModel.SPECULAR)
        with pytest.raises(NotImplementedError):
            _series_tracer(spec, [170.0], TraceConfig(engine="direct"))
        thick = SCENE.with_(outer_radius=105.0, reflectance=1.0)
        with pytest.raises(NotImplementedError):
            _series_tracer(thick, [170.0], TraceConfig(engine="direct"))

    def test_source_series_vmapped(self):
        """Source-batched series (VERDICT r4 #8 — the srcX/Y/Z axis of
        sweepSeries, fluxAtObserverOptimize.C:892-921): one device call
        sweeps source positions with the fixed-scene engine planning; the
        Lambertian exit-fraction law is source-position independent, so
        every member must land in the corpus window."""
        import jax.numpy as jnp

        from altair_tpu.sweep import stack_sources

        srcs = stack_sources(SOURCE_OVERNIGHT,
                             x=jnp.array([-60.0, -40.0, -20.0]),
                             z=jnp.array([-75.0, -75.0, -60.0]))
        n = 20_000
        counts, exits = run_series_vmapped(
            SCENE, sources=srcs, n_rays=n,
            grid=DetectorGrid(n_theta=3, n_phi=2), seed=4)
        assert counts.shape == (3, 3, 2)
        expect = expected_exit_fraction(170.0, 0.99)
        for e in exits:
            assert abs(e / n - expect) < 0.015, (e / n, expect)

    def test_source_series_validates_members(self):
        """Batched source members get the same fail-fast validation as the
        sequential driver (an exterior source would silently produce
        nonsense in the trace kernel)."""
        import jax.numpy as jnp

        from altair_tpu.sweep import stack_sources

        bad = stack_sources(SOURCE_OVERNIGHT, x=jnp.array([-80.0]))  # r=109.7
        with pytest.raises(ValueError, match="outside the sphere"):
            run_series_vmapped(SCENE, sources=bad, n_rays=100,
                               grid=DetectorGrid(n_theta=2, n_phi=2))

    def test_source_series_matches_port_route(self):
        """A one-member source series on the identical (scene, source)
        reproduces the port-series program: same per-member key fold,
        same tracer planning, same compacted scoring — so the SAME ray
        stream.  The two programs differ only in whether the source
        enters as constants (port route) or runtime jit arguments
        (source route, so new positions don't recompile); XLA's constant
        folding can flip individual hits at f32 decision boundaries, so
        the counts are allowed per-cell boundary flips but nothing
        stream-sized (a diverged stream would move cells by ~sqrt(N))."""
        import jax.numpy as jnp

        from altair_tpu.sweep import stack_sources

        grid = DetectorGrid(n_theta=3, n_phi=2)
        n = 8_000
        c_port, e_port = run_series_vmapped(
            SCENE, SOURCE_OVERNIGHT, port_angles=[SCENE.theta_max_deg],
            n_rays=n, grid=grid, seed=5)
        srcs = stack_sources(
            SOURCE_OVERNIGHT, x=jnp.full((1,), SOURCE_OVERNIGHT.x))
        c_src, e_src = run_series_vmapped(
            SCENE, sources=srcs, n_rays=n, grid=grid, seed=5)
        assert np.abs(c_port.astype(np.int64)
                      - c_src.astype(np.int64)).max() <= 3
        assert abs(int(e_port[0]) - int(e_src[0])) <= 3

    def test_series_axis_argument_contract(self):
        with pytest.raises(ValueError):
            run_series_vmapped(SCENE, SOURCE_OVERNIGHT, n_rays=100)

    def test_sequential_series_source_axis(self, tmp_path):
        """run_series(sources=...) writes one reference-named folder per
        source member (the reference's per-position directories)."""
        srcs = [SOURCE_OVERNIGHT.with_(x=-50.0),
                SOURCE_OVERNIGHT.with_(x=-30.0)]
        out = run_series(
            SCENE, SOURCE_OVERNIGHT, sources=srcs, port_angles=[164.0],
            repeats=1, n_rays=4_000, grid=DetectorGrid(n_theta=3, n_phi=2),
            save_root=str(tmp_path), seed=0, verbose=False)
        assert len(out) == 2
        for src in srcs:
            folder = os.path.join(
                str(tmp_path), series_folder("portAngleSweep", src, 164.0))
            assert len(glob.glob(os.path.join(folder, "*.csv"))) == 1

    def test_binomial_rejects_resume_path(self, tmp_path):
        p = tmp_path / "partial.csv"
        p.write_text("theta,phi,fraction\n")
        with pytest.raises(ValueError):
            sweep_detector_retrace(
                SCENE, SOURCE_OVERNIGHT, n_rays_per_pos=10,
                grid=DetectorGrid(n_theta=2, n_phi=2), save_folder=None,
                engine="binomial", resume_path=str(p), verbose=False)

    def test_vmapped_series_engines_agree(self):
        """Direct-dispatch vmapped series vs engine="simulate" on the same
        ports: exit fractions and maps agree within MC error."""
        from altair_tpu.config import TraceConfig

        ports = [164.0, 170.0]
        grid = DetectorGrid(n_theta=3, n_phi=2)
        n = 20_000
        c_d, e_d = run_series_vmapped(
            SCENE, SOURCE_OVERNIGHT, port_angles=ports, n_rays=n,
            grid=grid, seed=2)
        c_s, e_s = run_series_vmapped(
            SCENE, SOURCE_OVERNIGHT, port_angles=ports, n_rays=n,
            grid=grid, seed=3, cfg=TraceConfig(engine="simulate"))
        for p, (ed, es) in zip(ports, zip(e_d, e_s)):
            pexp = expected_exit_fraction(p, 0.99)
            sem = np.sqrt(pexp * (1 - pexp) / n)
            assert abs(ed - es) / n < 5 * sem, (p, ed, es)
        sigma = np.sqrt(np.maximum(c_s / n, 1e-6) / n) * 5 + 0.004
        assert (np.abs(c_d / n - c_s / n) < sigma).all()


class TestFluxmapReplicates:
    def test_mean_and_sem_consistent(self):
        """Replicate mean matches a lone map; per-cell sem lands near the
        binomial prediction sqrt(p(1-p)/n)/sqrt(K) for pseudorandom
        draws (pooled over bright cells; chi2 noise at K=6 is wide)."""
        from altair_tpu.sweep import fluxmap_replicates

        grid = DetectorGrid(n_theta=4, n_phi=3)
        n, K = 20_000, 6
        mean, sem = fluxmap_replicates(
            SCENE, SOURCE_OVERNIGHT, n_rays=n, grid=grid, replicates=K,
            seed=3)
        assert mean.shape == sem.shape == (4, 3)
        lone = sweep_detector_trace_once(
            SCENE, SOURCE_OVERNIGHT, n_rays=n, grid=grid, seed=11,
            save_folder=None, verbose=False).fluxmap
        tol = np.sqrt(np.maximum(mean, 1e-6) / n) * 4 + 0.002
        assert (np.abs(mean - lone) < tol).all()
        bright = mean * n > 20
        pred = np.sqrt(mean * (1 - mean) / n) / np.sqrt(K)
        ratio = sem[bright].sum() / pred[bright].sum()
        assert 0.4 < ratio < 2.2, ratio

    def test_qmc_replicates_tighter_total(self):
        """With cfg.qmc the replicate spread of the MAP TOTAL (~ the exit
        fraction, a smooth observable) must be far tighter than the
        pseudorandom replicates' — i.e. fluxmap_replicates' error bars
        really do capture the QMC gain; per-cell gains are milder
        (indicator functionals)."""
        from altair_tpu.config import TraceConfig
        from altair_tpu.sweep import fluxmap_replicates

        grid = DetectorGrid(n_theta=2, n_phi=2)
        n, K = 20_000, 6
        scene = SCENE.with_(exact_rim=False)

        def total_spread(cfg, seed):
            from altair_tpu.core.trace_waves import trace_rays_auto
            import jax

            totals = []
            for i in range(K):
                r = trace_rays_auto(jax.random.key(seed + i), scene,
                                    SOURCE_OVERNIGHT, n, cfg)
                totals.append(float(r.exited_port_mask().mean()))
            return np.std(totals, ddof=1)

        s_mc = total_spread(TraceConfig(), 100)
        s_q = total_spread(TraceConfig(qmc=1), 200)
        assert s_q < 0.5 * s_mc, (s_q, s_mc)
        # and the replicates API accepts the qmc config (per-cell sems at
        # K=6 are too chi2-noisy for a strict inequality — the spread
        # claim above is the discriminating check)
        mean_q, sem_q = fluxmap_replicates(
            scene, SOURCE_OVERNIGHT, n_rays=n, grid=grid, replicates=K,
            seed=7, cfg=TraceConfig(qmc=1))
        assert np.isfinite(sem_q).all() and (sem_q >= 0).all()
        assert (np.abs(mean_q - 0.43 / grid.n_positions * 4) < 1).all()

    def test_replicates_validation(self):
        from altair_tpu.sweep import fluxmap_replicates

        with pytest.raises(ValueError):
            fluxmap_replicates(SCENE, SOURCE_OVERNIGHT, n_rays=100,
                               replicates=1)


class TestDistribution:
    def test_run_and_write(self, tmp_path):
        d = run_distribution(SCENE_DEMO.with_(max_bounces=2048), SOURCE_DEMO,
                             n_rays=5_000)
        # demo scene has reflectance 1.0: every ray exits
        assert d.n_exited > 4_990
        assert d.angle_hist.sum() <= d.n_exited
        assert d.dz_hist.sum() == d.n_exited
        assert d.directions.shape == (d.n_exited, 3)

        p1 = str(tmp_path / "angular_dist.txt")
        p2 = str(tmp_path / "3dRayLog.txt")
        write_angular_dist(p1, d.dz_hist)
        write_ray_log(p2, d.directions)
        a = np.loadtxt(p1)
        assert a.shape == (100, 2)
        assert a[:, 1].sum() == d.n_exited
        logs = np.loadtxt(p2)
        assert logs.shape == (d.n_exited, 3)
        with open(p1) as fh:
            assert fh.readline().strip() == "# bin_center content"
        with open(p2) as fh:
            assert fh.readline().strip() == "# dx dy dz"


class TestInsphere:
    def test_sweep_and_dialect(self, tmp_path):
        path = str(tmp_path / "detector_sweep3.txt")
        r = sweep_insphere_detector(
            SCENE_INSPHERE.with_(max_bounces=2048), SOURCE_DEMO,
            n_rays=20_000, dtheta=15.0, save_path=path)
        t, p, f = read_detector_sweep(path)
        np.testing.assert_allclose(t, r.thetas)
        np.testing.assert_allclose(f, r.fractions, atol=1e-6)
        # on-axis positions see the most flux
        on_axis = f[np.abs(t) < 1e-9].mean()
        edge = f[np.abs(np.abs(t) - 45) < 1e-9].mean()
        assert on_axis > edge

    def test_retrace_mode_agrees(self):
        kw = dict(n_rays=20_000, dtheta=45.0, theta_max=45.0,
                  save_path=None)
        a = sweep_insphere_detector(
            SCENE_INSPHERE.with_(max_bounces=2048), SOURCE_DEMO,
            retrace=False, seed=0, **kw)
        b = sweep_insphere_detector(
            SCENE_INSPHERE.with_(max_bounces=2048), SOURCE_DEMO,
            retrace=True, seed=1, **kw)
        assert (np.abs(a.fractions - b.fractions) < 0.002).all()


class TestRetraceResume:
    def test_resume_from_partial_csv(self, tmp_path):
        """Crash-resume contract (SURVEY.md §5.3/5.4): a killed run's
        partial CSV continues where it stopped."""
        grid = DetectorGrid(n_theta=4, n_phi=2)
        full = sweep_detector_retrace(
            SCENE, SOURCE_OVERNIGHT, n_rays_per_pos=2_000, grid=grid,
            seed=7, save_folder=str(tmp_path), pos_chunk=2, verbose=False)
        # craft a partial file: first 2 theta rows only
        partial = str(tmp_path / "partial.csv")
        with open(full.path) as fh:
            lines = fh.readlines()
        data_start = next(i for i, l in enumerate(lines)
                          if l.startswith("theta"))
        with open(partial, "w") as fh:
            fh.writelines(lines[:data_start + 1 + 2 * grid.n_phi])
        resumed = sweep_detector_retrace(
            SCENE, SOURCE_OVERNIGHT, n_rays_per_pos=2_000, grid=grid,
            seed=7, save_folder=None, pos_chunk=2, verbose=False,
            resume_path=partial)
        # resumed rows 0-1 must be copied verbatim from the partial file
        np.testing.assert_allclose(resumed.fluxmap[:2], full.fluxmap[:2],
                                   atol=1e-6)
        # remaining rows recomputed (same seed/chunk => identical here)
        np.testing.assert_allclose(resumed.fluxmap[2:], full.fluxmap[2:],
                                   atol=1e-6)
