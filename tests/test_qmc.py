"""Sobol/QMC option for the direct sampler (core/qmc.py).

Pins: (1) the on-device Sobol generator bit-exact against scipy's
Joe-Kuo table, (2) marginal uniformity of the digitally-shifted points,
(3) the accuracy claim — exit-fraction RMSE across independent shifts far
below the i.i.d. binomial sem at the same N, with the analytic truth
known in closed form for the deterministic-first-flight production scene,
(4) distribution equivalence of the traced observables.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from altair_tpu import SCENE_OPTIMIZE, SOURCE_OVERNIGHT, TraceConfig
from altair_tpu.core import qmc
from altair_tpu.core.trace import EXITED
from altair_tpu.core.trace_direct import trace_rays_direct

SCENE = SCENE_OPTIMIZE.with_(max_bounces=4096, exact_rim=False)
CFG_QMC = TraceConfig(qmc=1)


def chain_exit_prob(scene) -> float:
    """Closed-form P(EXITED) for the direct chain when the deterministic
    first flight does not escape (true for SOURCE_OVERNIGHT):
    rho * f / (1 - (1-f) rho), f = south-cap area fraction."""
    f = (1.0 + np.cos(np.deg2rad(scene.theta_max_deg))) / 2.0
    rho = scene.reflectance
    return rho * f / (1.0 - (1.0 - f) * rho)


def test_sobol_bit_exact_vs_scipy():
    from scipy.stats import qmc as sqmc

    for d in (1, 7, qmc.MAX_DIM):
        ours = np.asarray(qmc.sobol_bits(4096, d)).T.astype(np.float64) / 2**32
        ref = sqmc.Sobol(d=d, scramble=False, bits=32).random(4096)
        np.testing.assert_array_equal(ours, ref)


def test_shifted_uniform_marginals():
    from scipy.stats import kstest

    u = np.asarray(qmc.sobol_uniforms(jax.random.key(3), 1 << 14, 7))
    assert u.shape == (7, 1 << 14)
    assert (u >= 0).all() and (u < 1).all()
    for d in range(7):
        assert kstest(u[d], "uniform").pvalue > 1e-4, d
    # different keys give different shifts
    v = np.asarray(qmc.sobol_uniforms(jax.random.key(4), 64, 7))
    assert np.abs(u[:, :64] - v).max() > 0.01


def test_qmc_exit_fraction_beats_mc():
    """The exit event is an axis-aligned box in (u_s1, u_term): Sobol
    integrates it at ~log^2(N)/N, so the RMSE across independent shifts
    must sit far below the binomial sem sqrt(p(1-p)/N).  This is the
    accuracy-per-ray capability the reference cannot have (its simulators
    consume an unbounded stream per ray)."""
    n = 4096
    reps = 16
    truth = chain_exit_prob(SCENE)

    run = jax.jit(lambda k: jnp.mean(
        (trace_rays_direct(k, SCENE, SOURCE_OVERNIGHT, n, CFG_QMC).status
         == EXITED).astype(jnp.float32)))
    est = np.array([float(run(jax.random.key(100 + i)))
                    for i in range(reps)])
    rmse_qmc = float(np.sqrt(np.mean((est - truth) ** 2)))
    sem_mc = float(np.sqrt(truth * (1 - truth) / n))
    assert rmse_qmc < 0.5 * sem_mc, (rmse_qmc, sem_mc)
    # unbiasedness: the mean of the shifted replicates is on the truth
    assert abs(est.mean() - truth) < 4 * sem_mc / np.sqrt(reps) + 1e-3

    # the pseudorandom path really does carry the binomial noise
    run_mc = jax.jit(lambda k: jnp.mean(
        (trace_rays_direct(k, SCENE, SOURCE_OVERNIGHT, n,
                           TraceConfig()).status
         == EXITED).astype(jnp.float32)))
    est_mc = np.array([float(run_mc(jax.random.key(200 + i)))
                       for i in range(reps)])
    rmse_mc = float(np.sqrt(np.mean((est_mc - truth) ** 2)))
    assert rmse_qmc < rmse_mc, (rmse_qmc, rmse_mc)


def test_qmc_mean_bounces_beats_mc():
    """Mean bounce count is smooth in u_g (geometric quantile) — the
    strongest QMC case."""
    n = 4096
    reps = 12
    run = jax.jit(lambda k, c: jnp.mean(
        trace_rays_direct(k, SCENE, SOURCE_OVERNIGHT, n, c)
        .n_bounces.astype(jnp.float32)))
    q = np.array([float(run(jax.random.key(i), CFG_QMC))
                  for i in range(reps)])
    m = np.array([float(run(jax.random.key(50 + i), TraceConfig()))
                  for i in range(reps)])
    assert q.std() < 0.5 * m.std(), (q.std(), m.std())
    assert abs(q.mean() - m.mean()) < 4 * m.std() / np.sqrt(reps) + 0.3


def test_qmc_distribution_unchanged():
    """Shifted-Sobol draws are marginally uniform, so every traced
    observable keeps its law: KS of exit-direction dz vs the
    pseudorandom path at the usual sim-vs-sim null."""
    from scipy.stats import ks_2samp

    n = 200_000
    a = trace_rays_direct(jax.random.key(1), SCENE, SOURCE_OVERNIGHT, n,
                          CFG_QMC)
    b = trace_rays_direct(jax.random.key(2), SCENE, SOURCE_OVERNIGHT, n,
                          TraceConfig())
    ea = np.asarray(a.status) == EXITED
    eb = np.asarray(b.status) == EXITED
    assert abs(ea.mean() - eb.mean()) < 5 * np.sqrt(0.43 * 0.57 / n)
    k = ks_2samp(np.asarray(a.direction.z)[ea], np.asarray(b.direction.z)[eb])
    assert k.pvalue > 1e-3, k


def test_qmc_composes_with_rim_deferral():
    """exact_rim scenes route the main phase through the direct sampler;
    cfg.qmc must compile and keep the corpus exit fraction."""
    from altair_tpu.core.trace_waves import trace_rays_auto

    scene = SCENE_OPTIMIZE.with_(max_bounces=4096)  # exact_rim=True
    res = trace_rays_auto(jax.random.key(5), scene, SOURCE_OVERNIGHT,
                          100_000, CFG_QMC)
    frac = float(res.exited_port_mask().mean())
    assert 0.418 < frac < 0.433, frac


def test_dim_cap():
    with pytest.raises(ValueError):
        qmc.sobol_bits(8, qmc.MAX_DIM + 1)


def test_owen_uniform_marginals_and_accuracy():
    """qmc=2 (hash-based Owen scrambling): marginals stay uniform, the
    elementary-interval structure survives (every dyadic bin of size
    n gets exactly one point per dimension), and the exit-fraction RMSE
    keeps the QMC gain."""
    from scipy.stats import kstest

    n = 1 << 12
    u = np.asarray(qmc.sobol_uniforms(jax.random.key(9), n, 7,
                                      mode="owen"))
    for d in range(7):
        assert kstest(u[d], "uniform").pvalue > 1e-4, d
        # a (0,1)-sequence scrambled by ANY nested permutation keeps one
        # point per dyadic interval of width 1/n in every dimension
        counts = np.bincount((u[d] * n).astype(np.int64), minlength=n)
        assert counts.max() == 1, d

    truth = chain_exit_prob(SCENE)
    run = jax.jit(lambda k: jnp.mean(
        (trace_rays_direct(k, SCENE, SOURCE_OVERNIGHT, n,
                           TraceConfig(qmc=2)).status
         == EXITED).astype(jnp.float32)))
    est = np.array([float(run(jax.random.key(300 + i))) for i in range(16)])
    rmse = float(np.sqrt(np.mean((est - truth) ** 2)))
    sem_mc = float(np.sqrt(truth * (1 - truth) / n))
    assert rmse < 0.5 * sem_mc, (rmse, sem_mc)


def test_owen_differs_from_shift():
    a = np.asarray(qmc.sobol_uniforms(jax.random.key(1), 64, 7,
                                      mode="owen"))
    b = np.asarray(qmc.sobol_uniforms(jax.random.key(1), 64, 7,
                                      mode="shift"))
    assert np.abs(a - b).max() > 0.01
    with pytest.raises(ValueError):
        qmc.sobol_uniforms(jax.random.key(1), 8, 2, mode="bogus")
