"""Settles Lambertian x Gaussian-roughness composition against the
roughness-0.75 corpus (VERDICT r2 item #1).

The reference ran Lambertian walls with ``SetGaussianRoughness`` 0.5
(``fluxAtObserver.C:156``) and 0.75 (the retained "Detector Data" corpus,
``results/detector_data_50000rays.csv:10``), leaving open whether ROBAST
composes the two laws (cosine emission about a Gaussian-tilted facet
normal) or ignores roughness under Lambertian.  These tests decide it
empirically against the four retained sigma=0.75 runs:

* ``detector_data_50000rays.csv``          — 180x90 grid, theta in [0, 90)
* ``detector_data_50000rays_4050points_{,_1,_3}.csv`` — 45x90 repeats
  (the ``_2`` repeat is retained but its data rows are zero at every
  probed theta — an aborted run, excluded)

Verdict (full forensics in docs/PARITY.md §10): **ROBAST ignores Gaussian
roughness under Lambertian.**

1. The corpus theta-profile SHAPE equals the roughness-inert model's
   (band ratios flat in theta for theta <= 55 deg).  Every roughened
   variant simulated (cosine about a tilted normal with absorb / leak /
   flip / immediate-rebound below-horizon handling, rotation and
   additive-sin tilt constructions) produces a measurably different
   shape or level.
2. The corpus LEVEL is the inert model at exactly QUARTER-area
   acceptance (disk radius 5 cm = width/4 despite the "20cm x 20cm"
   metadata) — an acceptance-constant artifact of the unretained
   "Detector Data" macro, not physics.  A genuine tilted-normal
   composition at sigma = 0.75 rad loses >= 12% of samples below the
   local horizon per bounce, which suppresses the port-exit flux by
   >= 6x — inconsistent with the observed 3.9x (= the area factor).
3. The corpus rows theta > 60 deg carry a shoulder EXCESS over the inert
   model.  The production retrace corpus (port-angle series
   ``results_overnight_04_1``, interpolated to port 170) matches this
   framework at every theta row including 85-89 deg
   (``test_physics_parity.GOLDEN_PROFILE``), so the shoulder is another
   artifact of the unretained macro (a different exit criterion admits
   rim-scattered shallow rays), not missing physics.
"""

import os

import numpy as np
import pytest

from altair_tpu import DetectorGrid, SCENE_OPTIMIZE, SOURCE_V1, TraceConfig
from altair_tpu.config import make_key
from altair_tpu.core.score import fluxmap_trace_once
from altair_tpu.core.trace_waves import trace_rays_auto

pytestmark = [pytest.mark.slow, pytest.mark.corpus]

RESULTS = "/root/reference/flux_at_observer/results"
CORPUS_FILES = [
    "detector_data_50000rays.csv",
    "detector_data_50000rays_4050points.csv",
    "detector_data_50000rays_4050points_1.csv",
    "detector_data_50000rays_4050points_3.csv",
]

N_RAYS = 300_000


def _load_profile(path):
    """theta-row mean fractions on the 45-row grid (2 deg bins on [0, 90))."""
    th, fr = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or line.startswith("theta"):
                continue
            parts = line.strip().split(",")
            if len(parts) == 3:
                th.append(float(parts[0]))
                fr.append(float(parts[2]))
    th = np.asarray(th)
    fr = np.asarray(fr)
    uth = np.unique(th)
    prof = np.array([fr[th == t].mean() for t in uth])
    if len(uth) == 180:          # rebin the 0.5-deg grid onto the 2-deg grid
        prof = prof.reshape(45, 4).mean(axis=1)
    assert prof.shape == (45,)
    return prof


@pytest.fixture(scope="module")
def corpus():
    if not os.path.isdir(RESULTS):
        pytest.skip("reference corpus not available")
    profs = np.stack([_load_profile(os.path.join(RESULTS, f))
                      for f in CORPUS_FILES])
    mean = profs.mean(axis=0)
    sem = profs.std(axis=0, ddof=1) / np.sqrt(len(profs))
    return mean, sem


@pytest.fixture(scope="module")
def inert_maps():
    """One inert trace scored at half- and quarter-area acceptance."""
    cfg = TraceConfig()
    scene = SCENE_OPTIMIZE.with_(max_bounces=4096)
    res = trace_rays_auto(make_key(0, cfg), scene, SOURCE_V1, N_RAYS, cfg)
    grids = {
        w: DetectorGrid(n_theta=45, theta_hi=90.0, width=w, height=w)
        for w in (10.0, 20.0)
    }
    return {
        w: np.asarray(fluxmap_trace_once(res, g)) / N_RAYS
        for w, g in grids.items()
    }


BANDS = [(0, 15), (15, 28)]      # theta [0,30) and [30,56) deg row bands


class TestRoughness075Corpus:
    def test_profile_matches_inert_quarter_acceptance(self, corpus,
                                                      inert_maps):
        """Level AND shape of the sigma=0.75 corpus = roughness-inert model
        at disk radius 5 cm, with NO roughness term, for theta <= 55 deg."""
        mean, _ = corpus
        ours = inert_maps[10.0].mean(axis=1)
        for lo, hi in BANDS:
            ratio = ours[lo:hi].mean() / mean[lo:hi].mean()
            assert abs(ratio - 1.0) < 0.08, (
                f"band rows [{lo},{hi}): ours/corpus = {ratio:.3f}")

    def test_level_is_quarter_area_of_stated_acceptance(self, corpus,
                                                        inert_maps):
        """The corpus level is 4x below the stated 20x20 acceptance — the
        area factor (pi 10^2)/(pi 5^2), not a physics suppression."""
        mean, _ = corpus
        lo, hi = BANDS[0]
        ratio = inert_maps[20.0][lo:hi].mean() / mean[lo:hi].mean()
        assert 3.5 < ratio < 4.5, f"area factor {ratio:.2f}, expected ~4"

    def test_roughened_sampling_is_excluded(self, corpus, inert_maps):
        """Quantitative exclusion of the tilted-normal composition: at
        sigma = 0.75 rad the below-horizon loss per bounce is >= 12%,
        bounding the port-exit flux at <= 1/6 of inert — far below the
        observed quarter-area level.

        P_below here is the exact cosine-weighted below-horizon fraction
        under a 1D Gaussian normal tilt (the weakest of the candidate
        constructions: 2D slope tilts lose more)."""
        rng = np.random.default_rng(0)
        n = 500_000
        tau = 0.75 * rng.standard_normal(n)
        ct = np.sqrt(rng.random(n))
        st = np.sqrt(1.0 - ct**2)
        ph = 2 * np.pi * rng.random(n)
        z = ct * np.cos(tau) - st * np.cos(ph) * np.sin(tau)
        p_below = (z < 0).mean()
        assert p_below > 0.115                      # the loss is real
        # exit-fraction law p/(p + 1-rho + rho*P_below) vs p/(p + 1-rho)
        p_cap = (1 - np.cos(np.deg2rad(10.0))) / 2
        suppression = (p_cap + 0.01 + 0.99 * p_below) / (p_cap + 0.01)
        assert suppression > 6.0
        # ... but the corpus sits at the area factor (~3.9-4.0), which the
        # quarter-acceptance test above reproduces WITHOUT any suppression.
        mean, _ = corpus
        lo, hi = BANDS[0]
        observed = inert_maps[20.0][lo:hi].mean() / mean[lo:hi].mean()
        assert observed < 0.75 * suppression, (
            "corpus level is inconsistent with tilted-normal sampling")

    def test_shoulder_is_macro_artifact_direction(self, corpus, inert_maps):
        """The theta > 60 deg shoulder: corpus exceeds the inert model
        (documented artifact of the unretained macro's exit criterion).
        The production retrace corpus at the same rows matches this
        framework (test_physics_parity.GOLDEN_PROFILE) — guard that the
        divergence stays confined to detector_data and points the
        documented way."""
        mean, sem = corpus
        ours = inert_maps[10.0].mean(axis=1)
        rows = slice(31, 42)                        # theta 63..83 deg
        assert (mean[rows] > ours[rows]).all(), (
            "detector_data shoulder no longer exceeds the inert model — "
            "revisit docs/PARITY.md §10")
        # repeat-run consistency of the corpus shoulder itself
        assert (sem[rows] < 0.15 * mean[rows] + 1e-6).all()
