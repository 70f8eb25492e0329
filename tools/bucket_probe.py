"""Bucketed gridbatch probe: is there a launch-gap sweet spot between
per-pair (G=1 pair per pallas_call, lax.map'd — the production default)
and whole-batch gridbatch (G=all, one call per axis — 23% slower at
B=128, BASELINE.md 2026-08-20)?

Sequencing lax.map over buckets of G pairs, each bucket one gridbatch
call (grid=(G,), per-block done-skip ON), pays launch gaps once per
G pairs while bounding the joint-convergence penalty to the within-bucket
cycle spread. Marginal-slope timing with a traced-K fori loop (one
compile per G).

Usage: python tools/bucket_probe.py [--batch 128] [--n 64] [--buckets 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--buckets", default="1,2,4,8",
                    help="pairs per pallas_call; 1 = production per-pair path")
    args = ap.parse_args()

    from mceik_tpu.eikonal.pallas_sweep import (
        lane_pack_factor, sweep_solve_pallas_gridbatch,
        sweep_solve_pallas_packed)
    from mceik_tpu.eikonal.solve import EikonalConfig, seed_source
    from mceik_tpu.grid import Grid

    n, B = args.n, args.batch
    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    cfg = EikonalConfig(tol=1e-3, max_iters=20, n_inner=4)
    P = lane_pack_factor(grid.shape)
    n_pairs = B // P
    assert B % P == 0

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    s = jnp.exp(0.1 * jax.random.normal(k1, (B,) + grid.shape)) \
        .astype(jnp.float32)
    srcs = jax.random.uniform(
        k2, (B, 3), minval=4.0, maxval=float(n - 4)).astype(jnp.float32)
    T0, frozen = jax.vmap(
        lambda x, sf: seed_source(sf, x, grid, cfg.seed_radius))(srcs, s)
    src_idx = jax.vmap(grid.to_index_coords)(srcs)
    s_src = jax.vmap(lambda sf, si: jax.scipy.ndimage.map_coordinates(
        sf, [si[d] for d in range(3)], order=1, mode="nearest"))(s, src_idx)
    shp = (n_pairs, P) + grid.shape

    def make_bucketed(G):
        """lax.map over n_pairs/G buckets of G pairs; G=1 uses the
        production per-pair packed kernel."""
        if G == 1:
            def solve(s_in):
                f = lambda a: sweep_solve_pallas_packed(
                    a[0], a[1], a[2], grid.spacing, cfg.tol, cfg.max_iters,
                    cfg.n_inner)
                return lax.map(f, (T0.reshape(shp), frozen.reshape(shp),
                                   s_in.reshape(shp))).reshape(
                                       (B,) + grid.shape)
            return solve
        nb = n_pairs // G
        assert n_pairs % G == 0, (n_pairs, G)
        bshp = (nb, G, P) + grid.shape

        def solve(s_in):
            f = lambda a: sweep_solve_pallas_gridbatch(
                a[0], a[1], a[2], a[3], grid.shape, grid.spacing,
                cfg.seed_radius, cfg.tol, cfg.max_iters, cfg.n_inner)
            out = lax.map(f, (T0.reshape(bshp), s_in.reshape(bshp),
                              src_idx.reshape((nb, G, P, 3)),
                              s_src.reshape((nb, G, P))))
            return out.reshape((B,) + grid.shape)
        return solve

    def make_loop(fn):
        @jax.jit
        def loop(s0, K):
            def body(i, carry):
                s_i, acc = carry
                T = fn(s_i)
                acc = acc + jnp.max(T)
                s_i = s_i + 1e-9 * acc
                return s_i, acc
            _, acc = lax.fori_loop(0, K, body, (s0, jnp.float32(0)))
            return acc
        return loop

    ref = None
    for G in [int(g) for g in args.buckets.split(",")]:
        fn = make_bucketed(G)
        T = jax.jit(fn)(s)
        jax.block_until_ready(T)
        if ref is None:
            ref = np.asarray(T)
        else:
            err = float(np.max(np.abs(np.asarray(T) - ref)))
            assert err < 1e-4, f"bucket G={G} parity broke: {err}"
        loop = make_loop(fn)
        jax.block_until_ready(loop(s, 1))
        t0 = time.perf_counter(); jax.block_until_ready(loop(s, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(loop(s, 6))
        t6 = time.perf_counter() - t0
        per = (t6 - t2) / 4.0
        print(json.dumps({
            "pairs_per_call": G,
            "ms_per_batch_solve": round(per * 1e3, 2),
            "ms_per_field": round(per * 1e3 / B, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
