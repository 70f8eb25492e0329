"""Benchmark: effective samples/s/chip on 3-D checkerboard tomography
(BASELINE.json's north-star metric; SURVEY.md §6).

Runs config-2-shaped adaptive Metropolis over a 3-D checkerboard model on
whatever accelerator is available, measures steady-state sampling
throughput (after compile + warmup), and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

There are no published reference numbers (reference mount empty, see
BASELINE.md); ``vs_baseline`` is measured against our own first recorded
number (BASELINE_VALUE below) so the driver can track round-over-round
improvement.
"""

import json
import time

import jax
import numpy as np

# First recorded value (samples/s/chip, chain-steps) — see BASELINE.md
# measurement log. Update when a new baseline is locked in.
# 2026-08-17: 48.364 chain-steps/s on TPU v5-lite — whole-field VMEM
# Pallas sweep solver via lax.map batching (first verified-correct TPU
# path; the earlier 12.2 figure ran a backend-miscompiled solver).
BASELINE_VALUE = 48.364


def main():
    from mceik_tpu.config import DataCfg, EikonalCfg, ModelCfg
    from mceik_tpu.datasets import make_dataset
    from mceik_tpu.diag.ess import ess
    from mceik_tpu.grid import Grid
    from mceik_tpu.model.posterior import build_posterior
    from mceik_tpu.samplers import am
    from mceik_tpu.samplers.base import init_chain_states, run_mcmc

    n = 64
    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    mcfg = ModelCfg(mode="tomo", inv_shape=(12, 12, 12), prior_sigma_u=0.2,
                    sigma=0.01)
    dcfg = DataCfg(dataset="checkerboard3d", n_src=8, n_rec=12, noise=0.01,
                   checker_cells=(3, 3, 3), checker_amplitude=0.1)
    ecfg = EikonalCfg(method="sweep", tol=1e-3, max_iters=20, n_inner=4)

    data, _ = make_dataset(grid, dcfg, mcfg)
    posterior = build_posterior(mcfg, data, grid, ecfg)

    # 16 chains/chip is the measured throughput sweet spot (8: 66.6,
    # 16: 79.7, 32: 76.9 chain-steps/s): enough batch to amortize the
    # per-pair dispatch gaps of the lax.map'd packed solves, not yet
    # HBM/scheduling-limited.
    n_chains = 16
    states = init_chain_states(posterior.logpost, posterior.init_params,
                               jax.random.PRNGKey(0), n_chains)
    example = posterior.init_params(jax.random.PRNGKey(1))
    hyper = am.init_hyper(posterior.prior_scales, 0.05, example)
    kernel = am.make_kernel(posterior.logpost)
    adapter = am.make_adapter()

    # Warm up adaptation + compile.
    r0 = run_mcmc(kernel, adapter, states, hyper, jax.random.PRNGKey(2),
                  n_warmup=50, n_steps=1)
    jax.block_until_ready(r0.logpost_trace)

    # Timed steady-state segment.
    n_steps = 100
    t0 = time.perf_counter()
    r = run_mcmc(kernel, None, r0.states, r0.hyper, jax.random.PRNGKey(3),
                 n_warmup=0, n_steps=n_steps)
    jax.block_until_ready(r.logpost_trace)
    wall = time.perf_counter() - t0

    chain_steps_per_s = n_steps * n_chains / wall
    lp = np.asarray(r.logpost_trace)
    ess_lp = ess(lp)
    eff_per_s = ess_lp / wall

    value = chain_steps_per_s
    vs = value / BASELINE_VALUE if BASELINE_VALUE else 1.0
    print(json.dumps({
        "metric": "chain_steps_per_s_chip_3d_checkerboard64_am",
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3),
        "extra": {
            "eff_samples_per_s": round(eff_per_s, 4),
            "wall_s": round(wall, 3),
            "n_chains": n_chains,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
