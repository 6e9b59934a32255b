"""CLI subcommands + ray visualization (light end-to-end runs)."""

import os

import numpy as np
import pytest

from altair_tpu import SCENE_V1, SOURCE_DEMO
from altair_tpu.cli import main
from altair_tpu.viz import plot_rays, trace_paths


class TestCli:
    @pytest.mark.slow
    def test_fluxmap_subcommand(self, tmp_path):
        rc = main([
            "fluxmap", "--rays", "2000", "--max-bounces", "512",
            "--theta-bins", "4", "--phi-bins", "2",
            "--out", str(tmp_path)])
        assert rc == 0
        files = os.listdir(tmp_path)
        assert any(f.startswith("fluxmap_traceonce_2000rays_4x2") for f in files)

    @pytest.mark.slow
    def test_fluxmap_replicates_flag(self, tmp_path):
        rc = main([
            "fluxmap", "--replicates", "3", "--rays", "1000",
            "--max-bounces", "512", "--theta-bins", "4", "--phi-bins", "2",
            "--out", str(tmp_path)])
        assert rc == 0
        files = os.listdir(tmp_path)
        assert any(f.startswith("fluxmap_traceonce_3000rays_4x2")
                   for f in files)

    @pytest.mark.slow
    def test_fluxmap_binomial_retrace(self, tmp_path):
        rc = main([
            "fluxmap", "--method", "retrace", "--retrace-engine", "binomial",
            "--oversample", "16", "--rays", "1000", "--max-bounces", "512",
            "--theta-bins", "4", "--phi-bins", "2",
            "--out", str(tmp_path)])
        assert rc == 0
        files = os.listdir(tmp_path)
        assert any(f.startswith("fluxmap_1000rays_4x2") for f in files)

    def test_distribution_subcommand(self, tmp_path, capsys):
        log = str(tmp_path / "raylog.txt")
        rc = main(["distribution", "--rays", "1000", "--max-bounces", "512",
                   "--reflectance", "1.0", "--ray-log", log])
        assert rc == 0
        assert "Flux of rays through the exit port:" in capsys.readouterr().out
        assert os.path.exists(log)

    def test_insphere_subcommand(self, tmp_path):
        out = str(tmp_path / "ds.txt")
        rc = main(["insphere", "--rays", "2000", "--max-bounces", "512",
                   "--reflectance", "1.0", "--dtheta", "45",
                   "--out-file", out])
        assert rc == 0
        with open(out) as fh:
            assert fh.readline().startswith("Theta(deg)")

    def test_visualize_subcommand(self, tmp_path):
        out = str(tmp_path / "rays.png")
        rc = main(["visualize", "--rays", "16", "--max-bounces", "256",
                   "--out-file", out])
        assert rc == 0
        assert os.path.getsize(out) > 1000

    @pytest.mark.slow
    def test_analyze_subcommand(self, tmp_path):
        # produce a map, then analyze it
        main(["fluxmap", "--rays", "2000", "--max-bounces", "512",
              "--theta-bins", "4", "--phi-bins", "2", "--out",
              str(tmp_path)])
        cwd = os.getcwd()
        try:
            os.chdir(tmp_path)
            rc = main(["analyze", str(tmp_path)])
        finally:
            os.chdir(cwd)
        assert rc == 0


class TestViz:
    def test_trace_paths_classification(self):
        paths = trace_paths(SCENE_V1.with_(max_bounces=512), SOURCE_DEMO,
                            n_rays=32, keep_history=64)
        assert sum(paths.census.values()) == 32
        # rho=1 scene: every non-suspended ray exits
        assert paths.census["noexit"] == 0
        assert (paths.lengths >= 2).all()

    def test_plot_rays_smoke(self, tmp_path):
        paths = trace_paths(SCENE_V1.with_(max_bounces=512), SOURCE_DEMO,
                            n_rays=8, keep_history=32)
        out = str(tmp_path / "p.png")
        plot_rays(paths, SCENE_V1, save_path=out)
        assert os.path.getsize(out) > 1000

    def test_only_red_mode(self, tmp_path):
        from altair_tpu import SCENE_OPTIMIZE
        paths = trace_paths(SCENE_OPTIMIZE.with_(max_bounces=512),
                            SOURCE_DEMO, n_rays=16, keep_history=32)
        out = str(tmp_path / "red.png")
        plot_rays(paths, SCENE_OPTIMIZE, only_show_red=True, save_path=out)
        assert os.path.exists(out)

    def test_detector_recorded_and_drawn(self, tmp_path):
        """The scored detector is carried on RayPaths and drawn in the
        scene (visualizeDetector shows the plate the green rays hit,
        fluxAtObserver.C:109-144 — VERDICT r1 missing #2)."""
        paths = trace_paths(SCENE_V1.with_(max_bounces=512), SOURCE_DEMO,
                            n_rays=8, keep_history=32, detector_theta=30.0)
        assert paths.detector is not None
        center, normal, width = paths.detector
        assert width == 20.0
        assert abs(np.linalg.norm(normal) - 1.0) < 1e-5
        out = str(tmp_path / "det.png")
        plot_rays(paths, SCENE_V1, save_path=out)
        assert os.path.getsize(out) > 1000

    def test_html_export(self, tmp_path):
        from altair_tpu.viz import export_html

        paths = trace_paths(SCENE_V1.with_(max_bounces=512), SOURCE_DEMO,
                            n_rays=8, keep_history=32)
        out = str(tmp_path / "rays.html")
        export_html(paths, SCENE_V1, out)
        html = open(out).read()
        assert "<canvas" in html and "det_disk" in html
        # the embedded data must be valid JSON with the scene content
        import json
        import re
        data = json.loads(re.search(r"const D = (\{.*?\});\n", html,
                                    re.S).group(1))
        assert data["det_disk"] is not None
        assert len(data["rays"]) == 8
        assert data["src"] is not None

    def test_cli_html_output(self, tmp_path):
        out = str(tmp_path / "rays.html")
        rc = main(["visualize", "--rays", "8", "--max-bounces", "256",
                   "--out-file", out])
        assert rc == 0
        assert os.path.getsize(out) > 2000


class TestAsciiViz:
    def test_ascii_fluxmap(self):
        from altair_tpu.viz import ascii_fluxmap
        fm = np.outer(np.cos(np.linspace(0, 1.4, 18)), np.ones(9))
        art = ascii_fluxmap(fm, width=30, height=8)
        lines = art.splitlines()
        assert len(lines) == 9  # header + 8 rows
        assert "@" in lines[1]     # peak row saturated
        assert lines[-1].strip(" .") == ""  # dimmest row near-empty

    def test_ascii_ray_projection(self):
        from altair_tpu.viz import ascii_ray_projection
        paths = trace_paths(SCENE_V1.with_(max_bounces=256), SOURCE_DEMO,
                            n_rays=8, keep_history=32)
        art = ascii_ray_projection(paths.points, paths.lengths,
                                   paths.classes, width=40, height=20)
        assert len(art.splitlines()) == 20
        assert any(c in art for c in "o+*")
