"""Probe for the FULLY fused cycle kernel (all three axis sweeps in one
pallas_call, sweep_axes012_fused — the r4->r5 lever's completion): parity
vs the fused01 2-call cycle it supersedes, then marginal-slope timing of
the full packed B-batch solve via both cycles.

    python tools/fused012_probe.py --interpret          # CPU parity only
    python tools/fused012_probe.py [--batch 128]        # on-chip timing
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from mceik_tpu.eikonal.pallas_sweep import (lane_pack_factor,
                                                sweep_solve_pallas_packed)
    from mceik_tpu.eikonal.solve import EikonalConfig, seed_source
    from mceik_tpu.grid import Grid

    n = 16 if args.interpret else args.n
    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    cfg = EikonalConfig(tol=1e-3, max_iters=20, n_inner=4)
    P = lane_pack_factor(grid.shape)
    interp = args.interpret
    sp = grid.spacing

    B = P if args.interpret else args.batch
    n_pairs = B // P
    kb = jax.random.split(jax.random.PRNGKey(1), 2)
    sb = jnp.exp(0.1 * jax.random.normal(kb[0], (B,) + grid.shape)) \
        .astype(jnp.float32)
    srcs = jax.random.uniform(kb[1], (B, 3), minval=4.0,
                              maxval=float(n - 4)).astype(jnp.float32)
    T0b, frb = jax.vmap(
        lambda x, sf: seed_source(sf, x, grid, cfg.seed_radius))(srcs, sb)
    src_idx = jax.vmap(grid.to_index_coords)(srcs)
    shp = (n_pairs, P) + grid.shape

    def batch_fused012(s_in):
        f = lambda a: sweep_solve_pallas_packed(
            a[0], a[1], a[2], sp, cfg.tol, cfg.max_iters, cfg.n_inner,
            interpret=interp, src_idx=a[3], seed_radius=cfg.seed_radius)
        return lax.map(f, (T0b.reshape(shp), frb.reshape(shp),
                           s_in.reshape(shp),
                           src_idx.reshape(n_pairs, P, 3))
                       ).reshape((B,) + grid.shape)

    def batch_prod(s_in):
        f = lambda a: sweep_solve_pallas_packed(
            a[0], a[1], a[2], sp, cfg.tol, cfg.max_iters, cfg.n_inner,
            interpret=interp)
        return lax.map(f, (T0b.reshape(shp), frb.reshape(shp),
                           s_in.reshape(shp))).reshape((B,) + grid.shape)

    Tf = jax.jit(batch_fused012)(sb)
    jax.block_until_ready(Tf)
    Tp_ = jax.jit(batch_prod)(sb)
    jax.block_until_ready(Tp_)
    err_b = float(jnp.max(jnp.abs(Tf - Tp_)))
    exact = bool(jnp.all(Tf == Tp_))
    print(json.dumps({"parity_batch_solve": err_b, "bit_exact": exact,
                      "B": B, "n": n, "P": P}), flush=True)
    assert err_b == 0.0, err_b
    if args.interpret:
        return

    def make_loop(fn):
        @jax.jit
        def loop(s0, K):
            def body(i, c):
                s_i, acc = c
                T = fn(s_i)
                acc = acc + jnp.max(T)
                return s_i + 1e-9 * acc, acc
            _, acc = lax.fori_loop(0, K, body, (s0, jnp.float32(0)))
            return acc
        return loop

    for name, fn in (("fused01_2call", batch_prod),
                     ("fused012_1call", batch_fused012)):
        loop = make_loop(fn)
        jax.block_until_ready(loop(sb, 1))
        t0 = time.perf_counter(); jax.block_until_ready(loop(sb, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(loop(sb, 6))
        t6 = time.perf_counter() - t0
        per = (t6 - t2) / 4.0
        print(json.dumps({"path": name,
                          "ms_per_batch_solve": round(per * 1e3, 2),
                          "ms_per_field": round(per * 1e3 / B, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
