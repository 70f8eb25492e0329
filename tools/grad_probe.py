"""Quick probe: cost of one posterior value_and_grad at config-2 scale
(64^3 checkerboard tomo) vs chain batch — sizes the gradient-sampler
benchmark budgets (tools/gradient_sampler_bench.py)."""

import time

import jax
import jax.numpy as jnp

from mceik_tpu.config import DataCfg, EikonalCfg, ModelCfg
from mceik_tpu.datasets import make_dataset
from mceik_tpu.grid import Grid
from mceik_tpu.model.posterior import build_posterior


def main():
    n = 64
    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    mcfg = ModelCfg(mode="tomo", inv_shape=(12, 12, 12), prior_sigma_u=0.2,
                    sigma=0.01)
    dcfg = DataCfg(dataset="checkerboard3d", n_src=8, n_rec=12, noise=0.01,
                   checker_cells=(3, 3, 3), checker_amplitude=0.1)
    ecfg = EikonalCfg(method="sweep", tol=1e-3, max_iters=20, n_inner=4)

    data, _ = make_dataset(grid, dcfg, mcfg)
    post = build_posterior(mcfg, data, grid, ecfg, differentiable=True)
    post_f = build_posterior(mcfg, data, grid, ecfg, differentiable=False)

    vg = jax.jit(jax.vmap(jax.value_and_grad(post.logpost)))
    fwd = jax.jit(jax.vmap(post_f.logpost))

    for n_chains in (4, 8, 16):
        keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
        params = jax.vmap(post.init_params)(keys)

        # value_and_grad
        out = vg(params)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = vg(params)
        jax.block_until_ready(out)
        dt_g = (time.perf_counter() - t0) / reps

        # forward only
        o2 = fwd(params)
        jax.block_until_ready(o2)
        t0 = time.perf_counter()
        for _ in range(reps):
            o2 = fwd(params)
        jax.block_until_ready(o2)
        dt_f = (time.perf_counter() - t0) / reps

        print(f"n_chains={n_chains:3d}  grad={dt_g*1e3:8.1f} ms "
              f"({dt_g/n_chains*1e3:6.1f} ms/chain)  "
              f"fwd={dt_f*1e3:8.1f} ms ({dt_f/n_chains*1e3:6.1f} ms/chain)  "
              f"ratio={dt_g/dt_f:.2f}")


if __name__ == "__main__":
    main()
