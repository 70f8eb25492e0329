"""Probe the Robbins-Monro acceptance-adaptation dynamics at flagship
DIMENSION without flagship cost (VERDICT r4 #6): a synthetic 1728-dim
Gaussian target with the tomography posterior's GN-like geometry —
prior-scale (0.2) soft subspace + a rank-96 data-constrained stiff
subspace — so the diag-AM / am_full adapters face the same
moving-acceptance-optimum that produced accept 0.084 (diag, 300 warmup)
and 0.144 (am_full, 60 warmup) on chip.

    python tools/rm_probe.py [--sampler am|am_full] [--warmups 50,300,1000]

Pure CPU (forced); one matvec per target eval.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def make_target(d=1728, n_obs=96, prior_sd=0.2, obs_sd=0.02, seed=0):
    """logpost(x) = -||x||^2/(2 prior_sd^2) - ||A x||^2/(2 obs_sd^2):
    a Gaussian with precision P = I/prior_sd^2 + A^T A / obs_sd^2 —
    the GN structure (soft prior ball + low-rank stiff data term)."""
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(n_obs, d)) / np.sqrt(d), jnp.float32)

    def logpost(x):
        r = A @ x
        return (-0.5 * jnp.sum(x * x) / prior_sd ** 2
                - 0.5 * jnp.sum(r * r) / obs_sd ** 2)

    return logpost


def run(sampler, n_warmup, n_steps=200, d=1728, n_chains=16, seed=0):
    from mceik_tpu.samplers import am, am_full, mala
    from mceik_tpu.samplers.base import init_chain_states, run_mcmc

    logpost = make_target(d=d)
    scales = 0.2 * jnp.ones((d,), jnp.float32)
    init = lambda key: 0.2 * jax.random.normal(key, (d,), jnp.float32)
    states = init_chain_states(logpost, init, jax.random.PRNGKey(seed),
                               n_chains)
    if sampler == "am":
        hyper = am.init_hyper(scales, 0.05, jnp.zeros((d,), jnp.float32))
        kernel = am.make_kernel(logpost)
        adapter = am.make_adapter()
        finalize = am.finalize
    else:
        hyper = am_full.init_hyper(scales, 1.0, jnp.zeros((d,), jnp.float32))
        kernel = am_full.make_kernel(logpost)
        adapter = mala.make_adapter(target_accept=0.234, adapt_cov=False)
        finalize = mala.finalize

    r = run_mcmc(kernel, adapter, states, hyper, jax.random.PRNGKey(seed + 1),
                 n_warmup=n_warmup, n_steps=n_steps, finalize_fn=finalize)
    acc = float(np.mean(np.asarray(r.accept_trace)))
    ls = float(np.asarray(r.hyper.log_step))
    print(json.dumps({"sampler": sampler, "n_warmup": n_warmup,
                      "post_warmup_accept": round(acc, 3),
                      "log_step": round(ls, 3)}), flush=True)
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", default="am")
    ap.add_argument("--warmups", default="50,300,1000")
    args = ap.parse_args()
    for w in [int(x) for x in args.warmups.split(",")]:
        run(args.sampler, w)


if __name__ == "__main__":
    main()
