"""Adaptive Metropolis (SURVEY.md §2.1 "Adaptive Metropolis"): Haario-style
proposal adaptation from chain history, pooled across chains. Config 2's
sampler.

For field-scale parameters (a 64^3 slowness field) the classic full
proposal covariance is infeasible (d^2 entries), so the TPU-native design
adapts a *diagonal* covariance online — per-coordinate posterior variances
estimated with a cross-chain+time Welford accumulator (the cross-chain
merge is exactly the collective-pooled adaptation of SURVEY.md §3.1) — plus
the usual global scale 2.38/sqrt(d) with Robbins-Monro acceptance tuning.

Optionally the field block uses a pCN (preconditioned Crank-Nicolson)
proposal, which is well-posed in the infinite-dimensional Gaussian-prior
limit and keeps acceptance dimension-robust.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp

from mceik_tpu.diag.moments import Welford, welford_init, welford_update_batch
from mceik_tpu.samplers.base import MHState
from mceik_tpu.utils import tree_random_normal, tree_size, tree_where


@flax.struct.dataclass
class AMHyper:
    log_step: jnp.ndarray
    scales: Any          # prior-based fallback scales (pytree like params)
    welford: Welford     # pooled running moments of the chain positions
    reg: jnp.ndarray     # regularization floor on the adapted std


def init_hyper(scales: Any, step_size: float, example_params: Any,
               reg: float = 1e-3) -> AMHyper:
    return AMHyper(
        log_step=jnp.asarray(jnp.log(step_size), jnp.float32),
        scales=scales,
        welford=welford_init(example_params),
        reg=jnp.asarray(reg, jnp.float32),
    )


def _proposal_std(hyper: AMHyper):
    """Blend adapted per-coordinate std with prior scales until the
    accumulator has enough mass (Haario's initial phase)."""
    n = hyper.welford.count
    ready = n > 50.0

    def std_leaf(m2, scale):
        var = m2 / jnp.maximum(n - 1.0, 1.0)
        adapted = jnp.sqrt(var + (hyper.reg * scale) ** 2)
        # scale == 0 marks frozen coordinates (spike-slab indicators moved
        # only by Gibbs): adaptation must never thaw them even though the
        # Gibbs flips give them cross-chain variance.
        return jnp.where(scale > 0, jnp.where(ready, adapted, scale), 0.0)

    return jax.tree.map(std_leaf, hyper.welford.m2, hyper.scales)


def make_kernel(logpost_fn: Callable) -> Callable:
    def kernel(key, state: MHState, hyper: AMHyper):
        k_prop, k_acc = jax.random.split(key)
        d = tree_size(state.params)
        step = jnp.exp(hyper.log_step) * 2.38 / jnp.sqrt(jnp.asarray(float(d)))
        std = _proposal_std(hyper)
        eps = tree_random_normal(k_prop, state.params)
        prop = jax.tree.map(lambda p, e, s: p + step * s * e,
                            state.params, eps, std)
        lp = logpost_fn(prop)
        log_ratio = lp - state.logpost
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
        new_params = tree_where(accept, prop, state.params)
        new_lp = jnp.where(accept, lp, state.logpost)
        info = {"accept_prob": accept_prob,
                "accepted": accept.astype(jnp.float32)}
        return MHState(params=new_params, logpost=new_lp), info

    return kernel


def make_adapter(target_accept: float = 0.234, gamma0: float = 1.5,
                 t0: float = 3.0, kappa: float = 0.5) -> Callable:
    def adapt(hyper: AMHyper, pooled, states: MHState, t):
        g = gamma0 / (t0 + t) ** kappa
        log_step = hyper.log_step + g * (pooled["accept_prob"] - target_accept)
        # Feed every chain's current position into the pooled covariance
        # estimate (batch Welford merge; cross-device this is the psum'd
        # adaptation statistic of SURVEY.md §2.4).
        welford = welford_update_batch(hyper.welford, states.params, axis=0)
        return hyper.replace(log_step=log_step, welford=welford)

    return adapt
