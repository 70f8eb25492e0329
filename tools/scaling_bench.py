"""Chain-parallel scaling-efficiency harness (BASELINE.json north-star:
>= 0.8 samples/s efficiency from 1 chip to N>=2 hosts).

Runs the config-2-shaped AM workload with chains sharded over 1, 2, ...,
all visible devices and reports chain-steps/s and efficiency vs linear
scaling. On a multi-host pod slice run it under the cluster launcher
(jax.distributed auto-initializes via the config path); on a single chip
it degenerates to the bench. CPU virtual devices (XLA_FLAGS
--xla_force_host_platform_device_count=8) exercise the code path, not the
performance.

    python tools/scaling_bench.py [--grid 32] [--chains-per-dev 4]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def measure(n_devices: int, chains_per_dev: int, n: int, steps: int) -> float:
    import jax.numpy as jnp

    from mceik_tpu.config import DataCfg, EikonalCfg, ModelCfg
    from mceik_tpu.datasets import make_dataset
    from mceik_tpu.dist.mesh import chain_mesh, shard_chains
    from mceik_tpu.grid import Grid
    from mceik_tpu.model.posterior import build_posterior
    from mceik_tpu.samplers import am
    from mceik_tpu.samplers.base import init_chain_states, run_mcmc

    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    mcfg = ModelCfg(mode="tomo", inv_shape=(8, 8, 8), prior_sigma_u=0.2,
                    sigma=0.01)
    dcfg = DataCfg(dataset="checkerboard3d", n_src=4, n_rec=6, noise=0.01,
                   checker_cells=(2, 2, 2), checker_amplitude=0.1)
    ecfg = EikonalCfg(method="sweep", tol=1e-3, max_iters=20)
    data, _ = make_dataset(grid, dcfg, mcfg)
    post = build_posterior(mcfg, data, grid, ecfg)

    n_chains = chains_per_dev * n_devices
    states = init_chain_states(post.logpost, post.init_params,
                               jax.random.PRNGKey(0), n_chains)
    mesh = chain_mesh(n_devices=n_devices)
    if n_devices > 1:
        states = shard_chains(states, mesh)
    ex = post.init_params(jax.random.PRNGKey(1))
    hyper = am.init_hyper(post.prior_scales, 0.05, ex)
    kernel = am.make_kernel(post.logpost)

    r = run_mcmc(kernel, None, states, hyper, jax.random.PRNGKey(2),
                 n_warmup=0, n_steps=5)  # compile + warm
    jax.block_until_ready(r.logpost_trace)
    t0 = time.perf_counter()
    r = run_mcmc(kernel, None, r.states, hyper, jax.random.PRNGKey(3),
                 n_warmup=0, n_steps=steps)
    jax.block_until_ready(r.logpost_trace)
    dt = time.perf_counter() - t0
    return n_chains * steps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=32)
    p.add_argument("--chains-per-dev", type=int, default=4)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    devs = len(jax.devices())
    sizes = sorted({1, 2, devs // 2, devs} - {0})
    sizes = [s for s in sizes if s <= devs]
    results = {}
    for nd in sizes:
        rate = measure(nd, args.chains_per_dev, args.grid, args.steps)
        eff = rate / (results.get(1, rate) * nd) if 1 in results else 1.0
        results[nd] = rate
        print(json.dumps({"n_devices": nd, "chain_steps_per_s": round(rate, 2),
                          "efficiency_vs_1dev": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
