"""Analysis layer: CSV pipeline, fits, averaging, finite-port oracles."""

import os

import numpy as np
import pytest

from altair_tpu.analysis import (
    analyze,
    average_runs,
    cosine_func,
    expected_exit_fraction,
    fit_cosine,
    ideal_cosine_flux,
    load,
    port_area_fraction,
    projection_factor_curve,
    projection_factor_grid,
    projection_factor_quad,
    sphere_multiplier,
    subtended_flux,
    theta_profile,
    z_angle_distribution,
)
from altair_tpu.io import FluxmapMetadata, FluxmapWriter


def _write_csv(tmp_path, name, fractions, n_theta=6, n_phi=4, seed=0):
    meta = FluxmapMetadata(
        n_rays=1000, detector_width_cm=40, detector_height_cm=40,
        inner_radius_cm=100.1, outer_radius_cm=101, exit_port_angle_deg=170,
        n_theta=n_theta, n_phi=n_phi, reflectance=0.99, roughness=0.01,
        source_pos_cm=(-60, 0, -75), source_dir=(5, 0, 0),
        max_reflections=50000)
    th = (np.arange(n_theta) + 0.5) * 90 / n_theta
    ph = (np.arange(n_phi) + 0.5) * 360 / n_phi
    with FluxmapWriter(str(tmp_path / name), meta) as w:
        w.write_map(th, ph, fractions)
        w.write_footer(1.0)
        return w.path


@pytest.fixture
def cosine_maps(tmp_path):
    """Three noisy cos(theta) maps."""
    rng = np.random.default_rng(0)
    n_theta, n_phi = 6, 4
    th = (np.arange(n_theta) + 0.5) * 90 / n_theta
    base = 0.01 * np.cos(np.deg2rad(th))[:, None] * np.ones((1, n_phi))
    paths = []
    for i in range(3):
        noisy = base + rng.normal(0, 2e-4, base.shape)
        paths.append(_write_csv(tmp_path, f"run{i}.csv", noisy))
    return tmp_path, th, base


class TestPipeline:
    def test_load_and_profile(self, cosine_maps):
        tmp_path, th, base = cosine_maps
        d = load(str(tmp_path / "run0.csv"))
        thetas, mean, stderr = theta_profile(d)
        np.testing.assert_allclose(thetas, th)
        np.testing.assert_allclose(mean, base.mean(1), atol=2e-3)

    def test_fit_recovers_cosine(self, cosine_maps):
        tmp_path, th, base = cosine_maps
        d = load(str(tmp_path / "run1.csv"))
        thetas, mean, stderr = theta_profile(d)
        fit = fit_cosine(thetas, mean, "run1", stderr)
        assert abs(fit.popt[1] - 1.0) < 0.3      # b ~ 1
        assert fit.r_squared > 0.98

    def test_average_runs(self, cosine_maps):
        tmp_path, th, base = cosine_maps
        datasets = [load(str(tmp_path / f"run{i}.csv")) for i in range(3)]
        avg = average_runs(datasets)
        assert avg.filename == "AVERAGE"
        assert avg.stderr is not None
        assert (avg.stderr >= 0).all()
        np.testing.assert_allclose(
            sorted(np.unique(avg.theta)), sorted(np.unique(th)))

    def test_analyze_cli_writes_pngs(self, cosine_maps, tmp_path):
        dirpath, _, _ = cosine_maps
        fits = analyze(str(dirpath), average_mode=True, save=True,
                       out_dir=str(tmp_path))
        assert any(f.label == "AVERAGE" for f in fits)
        base = os.path.basename(os.path.normpath(str(dirpath))) + "_averaged"
        assert os.path.exists(str(tmp_path / f"{base}_theta_comparison.png"))
        assert os.path.exists(
            str(tmp_path / f"{base}_heatmap_comparison.png"))

    def test_analyze_missing_file_graceful(self, capsys):
        out = analyze("/nonexistent_dir_or_file.csv", save=False)
        assert out == []
        assert "File not found" in capsys.readouterr().out


class TestFinitePortOracles:
    def test_sphere_multiplier(self):
        # test.py:11 with rho=0.95, f=0.3
        assert np.isclose(sphere_multiplier(0.95, 0.3), 1 / (1 - 0.95 * 0.7))

    def test_subtended_flux_values(self):
        # subtendedFlux.py formula at theta=0
        v = subtended_flux(0.0, a=0.5, R=1.0, rho=0.99)
        alpha = np.arcsin(0.5)
        expect = 1 / (1 - 0.99 * 0.75) * 0.5 * np.sin(alpha) ** 2
        assert np.isclose(v, expect)

    def test_projection_factor_consistency(self):
        """Grid and dblquad versions agree (same integrand)."""
        theta = np.deg2rad(30.0)
        grid = projection_factor_grid(theta, R=1.0, r_p=1.0, num_points=400)
        quad = projection_factor_quad(theta, R=1.0, a=1.0)
        assert abs(grid - quad) / abs(quad) < 0.02

    def test_projection_factor_limits(self):
        """The integrand's cos(theta') -> 1 as r_p -> 0 (the factor measures
        only the finite-port deviation; the overall cos(theta) is a separate
        curve in the reference's comparison plot,
        ``projectionFactor.py:49-56``), and a large port pulls the factor
        below 1 at oblique angles."""
        th = np.linspace(0, 80, 9)
        small = projection_factor_curve(th, R=1.0, r_p=0.01)
        np.testing.assert_allclose(small, 1.0, atol=0.02)
        big = projection_factor_curve(th, R=1.0, r_p=0.9)
        assert big[0] >= big[-1]
        assert big[-1] < 0.9

    def test_quad_rejects_90deg(self):
        with pytest.raises(ValueError):
            projection_factor_quad(np.pi / 2)

    def test_exit_fraction_oracle_vs_corpus(self):
        assert abs(expected_exit_fraction(160, 0.99) - 0.748) < 0.005
        assert abs(expected_exit_fraction(164, 0.99) - 0.655) < 0.007
        assert abs(expected_exit_fraction(170, 0.99) - 0.425) < 0.008

    def test_port_area_fraction(self):
        assert np.isclose(port_area_fraction(170),
                          (1 - np.cos(np.deg2rad(10))) / 2)

    def test_ideal_cosine_flux(self):
        v = ideal_cosine_flux(0.0, rho=0.95, f=0.3)
        assert np.isclose(v, sphere_multiplier(0.95, 0.3) * 0.3)


class TestRayAnalysis:
    def test_z_angle_distribution(self):
        d = np.array([[0.0, 0.0, -1.0], [0.5, 0.0, -np.sqrt(3) / 2],
                      [2.0, 0.0, -1.0]])  # last row filtered (|dx|>1)
        angles, mask = z_angle_distribution(d)
        assert mask.sum() == 2
        np.testing.assert_allclose(angles, [0.0, -30.0], atol=1e-6)


class TestSingleRunPlots:
    def test_reference_png_naming(self, cosine_maps, tmp_path):
        from altair_tpu.analysis import analyze_single
        dirpath, _, _ = cosine_maps
        fit = analyze_single(str(dirpath / "run0.csv"), out_dir=str(tmp_path))
        assert fit is not None
        assert os.path.exists(str(tmp_path / "run0_heatmap.png"))
        assert os.path.exists(str(tmp_path / "run0_theta_analysis.png"))
