"""Tempered-likelihood Sequential Monte Carlo (SURVEY.md §2.1 "SMC", §3.4;
config 4).

Structure: particles start as exact prior draws; the inverse temperature
beta climbs 0 -> 1 on an *adaptive* ladder (each increment chosen by
bisection so the incremental weights keep ESS at ``ess_threshold * N``);
each stage reweights, systematically resamples (dist/resample.py — index
computation replicated, exchange via sharded gather), and rejuvenates with
K random-walk Metropolis steps targeting the tempered posterior
``log_prior + beta * log_lik``, whose proposal scale is Robbins-Monro
adapted from the pooled acceptance across all particles.

The temperature ladder lives in a host-side Python loop (its length is
data-dependent); everything inside a stage is jitted with ``beta`` traced,
so no stage ever recompiles. Accumulates the log-evidence estimate
``log Z = sum_t logmeanexp(incremental log-weights)`` for free.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mceik_tpu.dist.resample import (ess_from_log_weights, resample_tree,
                                     systematic_indices)
from mceik_tpu.utils import tree_random_normal, tree_where


@flax.struct.dataclass
class SMCState:
    params: Any                 # particle-batched pytree
    log_prior: jnp.ndarray      # (N,)
    log_lik: jnp.ndarray        # (N,)
    log_step: jnp.ndarray       # mutation proposal log-scale (shared)


@dataclasses.dataclass
class SMCResult:
    state: SMCState
    betas: List[float]
    ess_history: List[float]
    accept_history: List[float]
    log_evidence: float
    n_stages: int


def init_particles(posterior, key, n_particles: int,
                   step_size: float = 0.1) -> SMCState:
    keys = jax.random.split(key, n_particles)
    params = jax.vmap(posterior.sample_prior)(keys)
    lp = jax.vmap(posterior.log_prior)(params)
    ll = jax.vmap(posterior.log_lik)(params)
    return SMCState(params=params, log_prior=lp, log_lik=ll,
                    log_step=jnp.asarray(np.log(step_size), jnp.float32))


@partial(jax.jit, static_argnames=("log_prior_fn", "log_lik_fn", "n_steps"))
def _mutate(state: SMCState, beta, key, scales, log_prior_fn, log_lik_fn,
            n_steps: int, target_accept: float = 0.234):
    """K tempered-RWM steps over all particles; adapts the shared proposal
    scale from pooled acceptance between steps."""
    n = state.log_lik.shape[0]

    def one_step(carry, k):
        params, lp_prior, lp_lik, log_step = carry
        k1, k2 = jax.random.split(k)
        step = jnp.exp(log_step)

        def propose(key_i, p):
            eps = tree_random_normal(key_i, p)
            return jax.tree.map(lambda x, e, s: x + step * s * e, p, eps, scales)

        keys_p = jax.random.split(k1, n)
        prop = jax.vmap(propose)(keys_p, params)
        prop_prior = jax.vmap(log_prior_fn)(prop)
        prop_lik = jax.vmap(log_lik_fn)(prop)
        log_ratio = (prop_prior + beta * prop_lik) - (lp_prior + beta * lp_lik)
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        accept = jnp.log(jax.random.uniform(k2, (n,))) < log_ratio
        params = jax.tree.map(
            lambda a, b: jnp.where(
                accept.reshape((n,) + (1,) * (a.ndim - 1)), a, b), prop, params)
        lp_prior = jnp.where(accept, prop_prior, lp_prior)
        lp_lik = jnp.where(accept, prop_lik, lp_lik)
        # Pooled (cross-particle -> cross-device) acceptance adaptation.
        pooled = jnp.mean(accept_prob)
        log_step = log_step + 0.3 * (pooled - target_accept)
        return (params, lp_prior, lp_lik, log_step), pooled

    keys = jax.random.split(key, n_steps)
    (params, lp_prior, lp_lik, log_step), accepts = lax.scan(
        one_step, (state.params, state.log_prior, state.log_lik,
                   state.log_step), keys)
    return SMCState(params=params, log_prior=lp_prior, log_lik=lp_lik,
                    log_step=log_step), jnp.mean(accepts)


@jax.jit
def _ess_at(log_lik, beta_prev, beta):
    return ess_from_log_weights((beta - beta_prev) * log_lik)


@jax.jit
def _reweight_resample(state: SMCState, beta_prev, beta, key):
    lw = (beta - beta_prev) * state.log_lik
    log_inc = jax.scipy.special.logsumexp(lw) - jnp.log(lw.shape[0])
    idx = systematic_indices(key, lw)
    params = resample_tree(state.params, idx)
    return SMCState(params=params,
                    log_prior=jnp.take(state.log_prior, idx),
                    log_lik=jnp.take(state.log_lik, idx),
                    log_step=state.log_step), log_inc


def next_beta(log_lik, beta_prev: float, target_ess: float,
              n_bisect: int = 30) -> float:
    """Largest beta <= 1 whose incremental weights keep ESS >= target."""
    if float(_ess_at(log_lik, beta_prev, 1.0)) >= target_ess:
        return 1.0
    lo, hi = beta_prev, 1.0
    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        if float(_ess_at(log_lik, beta_prev, mid)) >= target_ess:
            lo = mid
        else:
            hi = mid
    return max(lo, beta_prev + 1e-6)


def run_smc(posterior, key, n_particles: int, n_mutation_steps: int = 5,
            ess_threshold: float = 0.5, step_size: float = 0.1,
            max_stages: int = 200, verbose: bool = False) -> SMCResult:
    """Full tempered SMC run: prior -> posterior."""
    k_init, k_loop = jax.random.split(jnp.asarray(key))
    state = init_particles(posterior, k_init, n_particles, step_size)
    target_ess = ess_threshold * n_particles

    betas, ess_hist, acc_hist = [0.0], [float(n_particles)], []
    log_z = 0.0
    beta = 0.0
    stage = 0
    while beta < 1.0 and stage < max_stages:
        k_loop, k_rs, k_mut = jax.random.split(k_loop, 3)
        beta_new = next_beta(state.log_lik, beta, target_ess)
        ess = float(_ess_at(state.log_lik, beta, beta_new))
        state, log_inc = _reweight_resample(state, beta, beta_new, k_rs)
        log_z += float(log_inc)
        state, acc = _mutate(state, beta_new, k_mut, posterior.prior_scales,
                             posterior.log_prior, posterior.log_lik,
                             n_mutation_steps)
        beta = beta_new
        stage += 1
        betas.append(beta)
        ess_hist.append(ess)
        acc_hist.append(float(acc))
        if verbose:
            print(f"[smc] stage={stage} beta={beta:.4f} ess={ess:.0f} "
                  f"accept={float(acc):.3f} logZ={log_z:.2f}")

    return SMCResult(state=state, betas=betas, ess_history=ess_hist,
                     accept_history=acc_hist, log_evidence=log_z,
                     n_stages=stage)


def run_smc_config(config, verbose: bool = True) -> SMCResult:
    """CLI entry: build the posterior from a RunConfig and run SMC."""
    from mceik_tpu.datasets import make_dataset
    from mceik_tpu.dist.mesh import chain_mesh, init_distributed, shard_chains
    from mceik_tpu.model.posterior import build_posterior

    init_distributed(config.dist)
    grid = config.grid.build()
    data, truth = make_dataset(grid, config.data, config.model)
    posterior = build_posterior(config.model, data, grid, config.eikonal)

    scfg = config.sampler
    key = jax.random.PRNGKey(scfg.seed)
    result = run_smc(posterior, key, scfg.n_particles,
                     n_mutation_steps=scfg.n_mutation_steps,
                     ess_threshold=scfg.ess_threshold,
                     step_size=scfg.step_size, verbose=verbose)
    if verbose:
        print(f"[smc] done: stages={result.n_stages} "
              f"logZ={result.log_evidence:.2f}")
    return result
