"""Samplers (SURVEY.md §1 L3): pure transition kernels composed with
``lax.scan`` (steps) x ``vmap`` (chains/particles).

A kernel is ``kernel(key, state, hyper) -> (state, info)`` where ``state``
is per-chain (vmapped) and ``hyper`` holds shared adaptation parameters
(step sizes, mass matrices, proposal covariances) updated *outside* the
vmap from cross-chain pooled statistics — the pooling mean becomes a
``psum`` when the chain axis is sharded over devices (SURVEY.md §2.3 DP).
"""

from mceik_tpu.samplers.base import MHState, run_mcmc, MCMCResult, init_chain_states  # noqa: F401
from mceik_tpu.samplers import rwm, am, am_full, hmc, mala  # noqa: F401
