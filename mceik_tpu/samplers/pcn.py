"""Preconditioned Crank-Nicolson (pCN) Metropolis (SURVEY.md §2.1
"Adaptive Metropolis" TPU-native upgrade).

For Gaussian-prior parameter blocks the pCN proposal

    theta' = sqrt(1 - rho^2) * theta + rho * sigma_prior * xi

is prior-reversible, so the acceptance ratio uses the LIKELIHOOD alone —
well-posed in the infinite-dimensional limit, which makes acceptance
dimension-robust for field parameters (a 64^3 slowness field) where plain
RW acceptance collapses. Non-Gaussian blocks (hypocenters' logistic-prior
``hypo_raw``) get a symmetric random walk whose prior ratio enters the
acceptance explicitly. rho is Robbins-Monro adapted toward 0.234 via
cross-chain pooled acceptance, like the other kernels.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp

from mceik_tpu.samplers.base import MHState
from mceik_tpu.utils import tree_random_normal, tree_where


@flax.struct.dataclass
class PCNHyper:
    log_rho: jnp.ndarray      # pCN step (maps through sigmoid to (0,1))
    gauss_scales: Any         # prior sigmas for Gaussian leaves (None = RW)
    rw_scales: Any            # scales for non-Gaussian leaves (None = pCN)


def init_hyper(gauss_scales: Any, rw_scales: Any, rho: float = 0.1) -> PCNHyper:
    rho = min(max(rho, 1e-4), 0.999)
    return PCNHyper(
        log_rho=jnp.asarray(jnp.log(rho / (1 - rho)), jnp.float32),
        gauss_scales=gauss_scales, rw_scales=rw_scales)


def make_kernel(log_lik_fn: Callable,
                log_prior_nongauss_fn: Optional[Callable] = None) -> Callable:
    """pCN-within-MH transition.

    log_lik_fn: likelihood alone (the Gaussian prior is absorbed by the
      proposal). log_prior_nongauss_fn: prior of the RW-proposed leaves
      (e.g. logistic hypo_raw terms); None if all leaves are Gaussian.

    The chain state's ``logpost`` field stores loglik + nongauss prior
    (the Gaussian prior term is intentionally absent — it cancels).
    """

    def kernel(key, state: MHState, hyper: PCNHyper):
        k_prop, k_acc = jax.random.split(key)
        rho = jax.nn.sigmoid(hyper.log_rho)
        eps = tree_random_normal(k_prop, state.params)

        def propose(p, e, gs, rs):
            if gs is not None:
                return jnp.sqrt(1.0 - rho * rho) * p + rho * gs * e
            return p + rho * rs * e

        prop = jax.tree.map(
            propose, state.params, eps, hyper.gauss_scales, hyper.rw_scales,
            is_leaf=lambda x: x is None)
        ll = log_lik_fn(prop)
        if log_prior_nongauss_fn is not None:
            ll = ll + log_prior_nongauss_fn(prop)
        log_ratio = ll - state.logpost
        accept_prob = jnp.exp(jnp.minimum(log_ratio, 0.0))
        accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
        new_params = tree_where(accept, prop, state.params)
        new_lp = jnp.where(accept, ll, state.logpost)
        info = {"accept_prob": accept_prob,
                "accepted": accept.astype(jnp.float32)}
        return MHState(params=new_params, logpost=new_lp), info

    return kernel


def make_adapter(target_accept: float = 0.234, gamma0: float = 1.5,
                 t0: float = 3.0, kappa: float = 0.5) -> Callable:
    def adapt(hyper: PCNHyper, pooled, states, t):
        g = gamma0 / (t0 + t) ** kappa
        log_rho = hyper.log_rho + g * (pooled["accept_prob"] - target_accept)
        return hyper.replace(log_rho=log_rho)

    return adapt


def init_state(log_lik_fn: Callable, params,
               log_prior_nongauss_fn: Optional[Callable] = None) -> MHState:
    lp = log_lik_fn(params)
    if log_prior_nongauss_fn is not None:
        lp = lp + log_prior_nongauss_fn(params)
    return MHState(params=params, logpost=lp)
