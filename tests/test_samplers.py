"""Sampler kernel correctness on closed-form targets (SURVEY.md §4
"Unit: samplers"): moment recovery within MC error, acceptance sanity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mceik_tpu.samplers import am, hmc, rwm
from mceik_tpu.samplers.base import init_chain_states, run_mcmc
from mceik_tpu.diag.moments import welford_finalize, welford_merge_chains
from mceik_tpu.diag.ess import ess, split_rhat


# Anisotropic correlated 2-D Gaussian target.
COV = np.array([[1.0, 0.6], [0.6, 4.0]])
PREC = np.linalg.inv(COV)
MEAN = np.array([1.0, -2.0])


def logpost(x):
    d = x - jnp.asarray(MEAN, jnp.float32)
    return -0.5 * d @ jnp.asarray(PREC, jnp.float32) @ d


def init_params(key):
    return jax.random.normal(key, (2,), jnp.float32)


def _pooled_moments(result):
    mean, var = welford_finalize(welford_merge_chains(result.welford))
    return np.asarray(mean), np.asarray(var)


def _check_moments(result, mean_tol, var_rtol):
    mean, var = _pooled_moments(result)
    np.testing.assert_allclose(mean, MEAN, atol=mean_tol)
    np.testing.assert_allclose(var, np.diag(COV), rtol=var_rtol)


def test_rwm_gaussian():
    scales = jnp.ones(2)
    states = init_chain_states(logpost, init_params, jax.random.PRNGKey(0), 8)
    result = run_mcmc(
        rwm.make_kernel(logpost), rwm.make_adapter(),
        states, rwm.init_hyper(scales, 0.5),
        jax.random.PRNGKey(1), n_warmup=500, n_steps=4000)
    _check_moments(result, mean_tol=0.25, var_rtol=0.35)
    acc = float(np.mean(np.asarray(result.accept_trace)))
    assert 0.1 < acc < 0.5, acc
    assert split_rhat(np.asarray(result.samples)).max() < 1.2


def test_am_gaussian():
    scales = jnp.ones(2)
    states = init_chain_states(logpost, init_params, jax.random.PRNGKey(0), 8)
    ex = init_params(jax.random.PRNGKey(9))
    result = run_mcmc(
        am.make_kernel(logpost), am.make_adapter(),
        states, am.init_hyper(scales, 1.0, ex),
        jax.random.PRNGKey(1), n_warmup=1000, n_steps=4000)
    _check_moments(result, mean_tol=0.25, var_rtol=0.35)
    # Adapted per-coordinate std should reflect the 1:2 marginal std ratio.
    m2 = np.asarray(result.hyper.welford.m2)
    n = float(result.hyper.welford.count)
    adapted_std = np.sqrt(m2 / (n - 1))
    ratio = adapted_std[1] / adapted_std[0]
    assert 1.4 < ratio < 2.8, ratio


def test_hmc_gaussian():
    scales = jnp.ones(2)
    states = init_chain_states(logpost, init_params, jax.random.PRNGKey(0), 8)
    ex = init_params(jax.random.PRNGKey(9))
    result = run_mcmc(
        hmc.make_kernel(logpost, n_leapfrog=8), hmc.make_adapter(),
        states, hmc.init_hyper(scales, 0.2, ex),
        jax.random.PRNGKey(1), n_warmup=500, n_steps=2000,
        finalize_fn=hmc.finalize)
    _check_moments(result, mean_tol=0.2, var_rtol=0.3)
    acc = float(np.mean(np.asarray(result.accept_trace)))
    assert acc > 0.55, acc
    # HMC should mix far better than RWM: decent ESS on the slow coordinate.
    x1 = np.asarray(result.samples)[:, :, 1]
    assert ess(x1) > 200, ess(x1)


def test_nuts_gaussian():
    from mceik_tpu.samplers import nuts
    scales = jnp.ones(2)
    states = init_chain_states(logpost, init_params, jax.random.PRNGKey(0), 8)
    ex = init_params(jax.random.PRNGKey(9))
    result = run_mcmc(
        nuts.make_kernel(logpost, max_tree_depth=5), hmc.make_adapter(0.8),
        states, hmc.init_hyper(scales, 0.2, ex),
        jax.random.PRNGKey(1), n_warmup=500, n_steps=1500,
        finalize_fn=hmc.finalize)
    _check_moments(result, mean_tol=0.2, var_rtol=0.3)
    acc = float(np.mean(np.asarray(result.accept_trace)))
    assert acc > 0.5, acc
    x1 = np.asarray(result.samples)[:, :, 1]
    assert ess(x1) > 500, ess(x1)
    assert split_rhat(np.asarray(result.samples)).max() < 1.05


def test_am_full_correlated_gaussian():
    """Full-covariance Haario AM must both recover moments AND learn the
    cross-coordinate correlation (its whole reason to exist — the
    diagonal variant cannot represent it)."""
    from mceik_tpu.samplers import am_full

    scales = jnp.ones(2)
    states = init_chain_states(logpost, init_params, jax.random.PRNGKey(0), 8)
    ex = init_params(jax.random.PRNGKey(9))
    result = run_mcmc(
        am_full.make_kernel(logpost), am_full.make_adapter(),
        states, am_full.init_hyper(scales, 1.0, ex),
        jax.random.PRNGKey(1), n_warmup=1000, n_steps=4000)
    _check_moments(result, mean_tol=0.25, var_rtol=0.35)
    acc = float(np.mean(np.asarray(result.accept_trace)))
    assert 0.1 < acc < 0.45, acc
    # The adapted covariance's correlation must approach the target's 0.3.
    h = result.hyper
    cov = np.asarray(h.m2) / max(float(h.count) - 1.0, 1.0)
    corr = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    target_corr = COV[0, 1] / np.sqrt(COV[0, 0] * COV[1, 1])
    assert abs(corr - target_corr) < 0.15, (corr, target_corr)


def test_am_full_frozen_coordinates():
    """Coordinates with prior scale 0 (spike-slab indicators) must never
    move under am_full, even after adaptation sees cross-chain variance."""
    from mceik_tpu.samplers import am_full

    def lp3(x):
        return logpost(x[:2]) - 0.5 * jnp.sum(x[2:] ** 2)

    def init3(key):
        return jax.random.normal(key, (3,), jnp.float32)

    scales = jnp.asarray([1.0, 1.0, 0.0])
    states = init_chain_states(lp3, init3, jax.random.PRNGKey(0), 8)
    ex = init3(jax.random.PRNGKey(9))
    frozen0 = np.asarray(states.params)[:, 2].copy()
    result = run_mcmc(
        am_full.make_kernel(lp3), am_full.make_adapter(),
        states, am_full.init_hyper(scales, 1.0, ex),
        jax.random.PRNGKey(1), n_warmup=300, n_steps=300)
    frozen1 = np.asarray(result.states.params)[:, 2]
    np.testing.assert_array_equal(frozen0, frozen1)


@pytest.mark.parametrize("n_warmup", [
    50, 300, pytest.param(1000, marks=pytest.mark.slow)])
def test_am_acceptance_stable_across_warmup_lengths(n_warmup):
    """Longer warmup must not DEGRADE acceptance (VERDICT r2 #5: the r2
    adapter landed at 0.084 after 300 warmup steps vs 0.4 after 50 on the
    bench shape — a moving-target Robbins-Monro pathology). With the
    geometric-mean-normalized proposal shape and the forgetting Welford,
    every warmup budget must land steady-state acceptance near the 0.234
    target (measured 0.156 / 0.230 / 0.255 at 50/300/1000 — monotone
    IMPROVING with warmup now). Reduced scale: strongly correlated 32-dim
    Gaussian, 2x overdispersed posterior-shaped init (burn-in short enough
    that even the 50-step budget isolates adapter dynamics rather than an
    unconverged chain)."""
    d = 32
    rho = 0.95
    idx = np.arange(d)
    cov = rho ** np.abs(idx[:, None] - idx[None, :])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    L = jnp.asarray(np.linalg.cholesky(cov), jnp.float32)

    def lp(x):
        return -0.5 * x @ prec @ x

    def init(key):
        return 2.0 * (L @ jax.random.normal(key, (d,), jnp.float32))

    scales = jnp.ones(d)
    states = init_chain_states(lp, init, jax.random.PRNGKey(0), 16)
    ex = init(jax.random.PRNGKey(9))
    result = run_mcmc(am.make_kernel(lp), am.make_adapter(), states,
                      am.init_hyper(scales, 0.3, ex), jax.random.PRNGKey(1),
                      n_warmup=n_warmup, n_steps=300,
                      finalize_fn=am.finalize)
    acc = float(np.mean(np.asarray(result.accept_trace)))
    assert 0.15 < acc < 0.35, (n_warmup, acc)


def test_mala_gaussian():
    """Preconditioned MALA: exact moment recovery on the closed-form
    target (the whitened Hastings correction is exercised because the
    adapted covariance never equals the target covariance exactly), plus
    acceptance near the Langevin-optimal 0.574 and strong mixing of the
    slow coordinate (one gradient/step)."""
    from mceik_tpu.samplers import mala

    scales = jnp.ones(2)
    states = mala.init_states(logpost, init_params, jax.random.PRNGKey(0), 8)
    ex = init_params(jax.random.PRNGKey(9))
    result = run_mcmc(
        mala.make_kernel(logpost), mala.make_adapter(),
        states, mala.init_hyper(scales, 0.5, ex),
        jax.random.PRNGKey(1), n_warmup=800, n_steps=3000)
    _check_moments(result, mean_tol=0.2, var_rtol=0.3)
    acc = float(np.mean(np.asarray(result.accept_trace)))
    assert 0.4 < acc < 0.8, acc
    x1 = np.asarray(result.samples)[:, :, 1]
    assert ess(x1) > 400, ess(x1)
    assert split_rhat(np.asarray(result.samples)).max() < 1.05


def test_mala_mismatched_preconditioner_still_exact():
    """A deliberately WRONG pinned preconditioner (identity on the 1:4
    anisotropic target) must not bias the moments — only slow mixing.
    This isolates the Hastings ratio: a sign error in the reverse-drift
    term passes the well-adapted test above but fails here."""
    from mceik_tpu.samplers import mala

    scales = jnp.ones(2)
    states = mala.init_states(logpost, init_params, jax.random.PRNGKey(3), 8)
    ex = init_params(jax.random.PRNGKey(9))
    hyper = mala.prime_covariance(
        mala.init_hyper(scales, 0.8, ex), np.eye(2, dtype=np.float32))
    # No covariance adaptation: RM step-size only (adapter updates the
    # welford but the pinned count makes its relative weight ~1e-3).
    result = run_mcmc(
        mala.make_kernel(logpost), mala.make_adapter(),
        states, hyper, jax.random.PRNGKey(4), n_warmup=800, n_steps=6000)
    _check_moments(result, mean_tol=0.25, var_rtol=0.35)


def test_mala_frozen_coordinates():
    """Prior scale 0 (spike-slab indicator convention) must freeze the
    coordinate exactly: no drift, no noise, no effect on the Hastings
    ratio of the active block."""
    from mceik_tpu.samplers import mala

    def lp3(x):
        d = x[:2] - jnp.asarray(MEAN, jnp.float32)
        return -0.5 * d @ jnp.asarray(PREC, jnp.float32) @ d - 0.5 * x[2] ** 2

    def init3(key):
        return jax.random.normal(key, (3,), jnp.float32)

    scales = jnp.asarray([1.0, 1.0, 0.0])
    states = mala.init_states(lp3, init3, jax.random.PRNGKey(0), 8)
    frozen0 = np.asarray(states.params)[:, 2].copy()
    result = run_mcmc(
        mala.make_kernel(lp3), mala.make_adapter(),
        states, mala.init_hyper(scales, 0.5, init3(jax.random.PRNGKey(9))),
        jax.random.PRNGKey(1), n_warmup=300, n_steps=300)
    np.testing.assert_array_equal(np.asarray(result.states.params)[:, 2],
                                  frozen0)
    mean, _ = _pooled_moments(result)
    np.testing.assert_allclose(mean[:2], MEAN, atol=0.3)


@pytest.mark.slow
def test_step_adaptation_warmup_stability_flagship_dim():
    """VERDICT r4 #6 done-criterion: the dual-averaging step tuner lands
    post-warmup acceptance inside [0.15, 0.35] at flagship DIMENSION
    (1728) for short AND long warmups, on a synthetic target with the
    tomography posterior's GN geometry (soft prior ball + rank-96 stiff
    data subspace — tools/rm_probe.py). The old Robbins-Monro tuner
    measured 0.084 (diag, 300 warmup) / 0.144 (am_full, 60 warmup) on
    the real posterior."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.rm_probe import run as rm_run

    for sampler, warmups in (("am", (50, 300)), ("am_full", (60, 300))):
        for w in warmups:
            acc = rm_run(sampler, w, n_steps=200)
            assert 0.15 < acc < 0.35, (sampler, w, acc)
