"""Two-stage scatter-retrace pipeline (nonLambertianFlux.C methodology)."""

import jax
import numpy as np

from altair_tpu import DetectorGrid, SOURCE_DEMO, SphereScene
from altair_tpu.sweep import sweep_scatter_retrace, trace_scatter_retrace
import pytest

pytestmark = pytest.mark.slow  # two-stage 100k-ray pipelines


# nonLambertianFlux.C scene: rho=1 walls (no SetReflectance), limit 10000,
# gBRDF(roughness=0.3, spec=0.4, diff=0.6)  (:211)
SCENE = SphereScene(reflectance=1.0, roughness=0.5, world_half=200.0,
                    max_bounces=2048, specular_prob=0.4, diffuse_prob=0.6,
                    brdf_roughness=0.3)


class TestScatterRetrace:
    def test_pipeline_terminates_and_scores(self):
        res = trace_scatter_retrace(jax.random.key(0), SCENE, SOURCE_DEMO,
                                    10_000)
        st = np.asarray(res.status)
        assert (st != 0).all()
        z = np.asarray(res.last_point.z)
        frac = ((st == 1) & (z < -100)).mean()
        # most scattered rays eventually exit (rho = 1); some re-scattered
        # from box endpoints leave sideways
        assert 0.8 < frac <= 1.0

    def test_determinism(self):
        a = trace_scatter_retrace(jax.random.key(3), SCENE, SOURCE_DEMO,
                                  2_000)
        b = trace_scatter_retrace(jax.random.key(3), SCENE, SOURCE_DEMO,
                                  2_000)
        np.testing.assert_array_equal(np.asarray(a.status),
                                      np.asarray(b.status))

    def test_sweep_shape_and_scale(self):
        sw = sweep_scatter_retrace(SCENE, SOURCE_DEMO, n_rays=10_000)
        # macro default grid: 45x20, 10x10 cm detector (:317-319,37)
        assert sw.fluxmap.shape == (45, 20)
        assert 0 < sw.fluxmap.max() < 0.05
        # theta profile decreases overall (flux forward-biased)
        prof = sw.fluxmap.mean(axis=1)
        assert prof[:5].mean() > prof[-5:].mean()
