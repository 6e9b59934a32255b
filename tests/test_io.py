"""CSV dialect round-trip + unique-filename + progress protocol."""

import os

import numpy as np

from altair_tpu.io import (
    EtaTracker,
    FluxmapMetadata,
    FluxmapWriter,
    fluxmap_filename,
    position_line,
    read_fluxmap,
    unique_filename,
)


def _meta(**kw):
    defaults = dict(
        n_rays=100000, detector_width_cm=40, detector_height_cm=40,
        inner_radius_cm=100.1, outer_radius_cm=101,
        exit_port_angle_deg=170, n_theta=180, n_phi=90,
        reflectance=0.99, roughness=0.01,
        source_pos_cm=(-60, 0, -75), source_dir=(5, 0, 0),
        max_reflections=50000, trace_once=True,
        generated="2026-01-01 00:00:00",
    )
    defaults.update(kw)
    return FluxmapMetadata(**defaults)


class TestFilename:
    def test_convention(self):
        assert fluxmap_filename(100000, 180, 90, (-60.0, 0.0, -75.0), True) \
            == "fluxmap_traceonce_100000rays_180x90_src-60_0_-75.csv"
        assert fluxmap_filename(50000, 180, 90, (-60.0, 0.0, -80.0), False) \
            == "fluxmap_50000rays_180x90_src-60_0_-80.csv"

    def test_unique_suffixing(self, tmp_path):
        base = str(tmp_path / "out.csv")
        assert unique_filename(base) == base
        open(base, "w").close()
        assert unique_filename(base) == str(tmp_path / "out_1.csv")
        open(str(tmp_path / "out_1.csv"), "w").close()
        assert unique_filename(base) == str(tmp_path / "out_2.csv")


class TestHeader:
    def test_reference_keys(self):
        lines = _meta().header_lines()
        text = "\n".join(lines)
        # exact keys parsed back by flux_analysis.py:16-25
        for key in ["Number of rays", "Detector dimensions",
                    "Sphere inner radius", "Sphere outer radius",
                    "Exit port angle", "Theta bins", "Phi bins",
                    "Mirror reflectance", "Gaussian roughness",
                    "Source position (x,y,z)", "Source direction (x,y,z)",
                    "Max reflections"]:
            assert f"# {key}:" in text, key
        assert lines[-1] == "theta,phi,fraction"
        assert "# Method: Trace-Once" in text

    def test_reference_value_formats(self):
        text = "\n".join(_meta().header_lines())
        assert "# Sphere inner radius: 100.1cm" in text
        assert "# Exit port angle: 170 degrees" in text
        assert "# Mirror reflectance: 0.99" in text
        assert "# Source position (x,y,z): -60cm, 0cm, -75cm" in text


class TestRoundTrip:
    def test_write_read(self, tmp_path):
        path = str(tmp_path / "fluxmap.csv")
        th = np.array([0.25, 0.75])
        ph = np.array([2.0, 6.0, 10.0])
        frac = np.arange(6, dtype=float).reshape(2, 3) / 100
        meta = _meta(n_theta=2, n_phi=3)
        with FluxmapWriter(path, meta) as w:
            w.write_map(th, ph, frac)
            w.write_footer(12.5, ray_time_s=1.5, sweep_time_s=11.0,
                           exited=42500, n_rays=100000,
                           completed="2026-01-01 01:00:00")
            out_path = w.path
        theta, phi, fraction, md = read_fluxmap(out_path)
        np.testing.assert_allclose(theta, np.repeat(th, 3))
        np.testing.assert_allclose(phi, np.tile(ph, 2))
        np.testing.assert_allclose(fraction, frac.ravel(), atol=1e-6)
        assert md["Exit port angle"] == "170 degrees"
        assert md["Total rays exiting port"] == "42500 out of 100000"
        assert md["Ray tracing time"] == "1.5 seconds"

    def test_crash_resilience_flush(self, tmp_path):
        """Rows are on disk immediately after write_row
        (fluxAtObserver.C:376-377)."""
        path = str(tmp_path / "f.csv")
        w = FluxmapWriter(path, _meta(n_theta=1, n_phi=1))
        w.write_row(0.25, 2.0, 0.123456)
        with open(w.path) as fh:  # do NOT close the writer first
            assert "0.250000,2.000000,0.123456" in fh.read()
        w.close()

    def test_footer_parsed_as_metadata(self, tmp_path):
        path = str(tmp_path / "g.csv")
        with FluxmapWriter(path, _meta()) as w:
            w.write_row(0.25, 2.0, 0.5)
            w.write_footer(100.0)
            out = w.path
        *_, md = read_fluxmap(out)
        assert "Sweep completed at" in md
        assert md["Total execution time"] == "100 seconds"


class TestProgress:
    def test_position_line_format(self):
        assert position_line(0.25, 2.0, 308, 20000) == \
            "0.2°, 2.0°: 308/20000 = 0.01540000"

    def test_eta_tracker(self):
        t = EtaTracker(total=100)
        for _ in range(5):
            assert t.tick() is None  # needs >5 samples (reference :601)
        line = t.tick()
        assert line is not None and "ETA:" in line
        assert np.isclose(t.percent, 6.0)


class TestV1Dialect:
    def test_v1_header_keys(self):
        lines = _meta(style="v1", n_rays=50000, detector_width_cm=10,
                      detector_height_cm=10, source_dir=(5, 2, 0)
                      ).header_lines()
        text = "\n".join(lines)
        # fluxAtObserver.C:335-344 exact key set
        assert "# Number of rays per position: 50000" in text
        assert "# Detector dimensions: 10cm x 10cm" in text
        assert "# y direction: 2" in text
        assert "Mirror reflectance" not in text
        assert "Method:" not in text
        assert lines[-1] == "theta,phi,fraction"
