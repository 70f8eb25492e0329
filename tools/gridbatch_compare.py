"""Head-to-head: grid-batched packed solve (ONE pallas_call per axis for
the whole batch — VERDICT r2 #3's launch-gap amortization) vs the
superseded per-pair ``lax.map`` packed path, at the flagship bench shape
(64^3, B sources). Marginal-slope timing (K solves inside one jit with a
data dependence; host timings through the tunnel carry ~50 ms fixed
overhead — BASELINE.md 2026-08-19).

Usage: python tools/gridbatch_compare.py [--batch 128] [--n 64]
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
    ap.add_argument("--batch", type=int, default=128,
                    help="flat solve batch (chains x sources)")
    ap.add_argument("--n", type=int, default=64)
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
    assert B % P == 0, (B, P)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    s = jnp.exp(0.1 * jax.random.normal(k1, (B,) + grid.shape)) \
        .astype(jnp.float32)
    srcs = jax.random.uniform(
        k2, (B, 3), minval=4.0, maxval=float(n - 4)).astype(jnp.float32)

    T0, frozen = jax.vmap(
        lambda x, sf: seed_source(sf, x, grid, cfg.seed_radius))(srcs, s)
    src_idx = jax.vmap(grid.to_index_coords)(srcs)
    s_src = jax.vmap(lambda sf, si: jax.scipy.ndimage.map_coordinates(
        sf, [si[d] for d in range(3)], order=1, mode="nearest"))(s, src_idx)

    shp = (B // P, P) + grid.shape

    def solve_gridbatch(s_in):
        out = sweep_solve_pallas_gridbatch(
            T0.reshape(shp), s_in.reshape(shp),
            src_idx.reshape((B // P, P, 3)), s_src.reshape((B // P, P)),
            grid.shape, grid.spacing, cfg.seed_radius, cfg.tol,
            cfg.max_iters, cfg.n_inner)
        return out

    def solve_perpair(s_in):
        f = lambda a: sweep_solve_pallas_packed(
            a[0], a[1], a[2], grid.spacing, cfg.tol, cfg.max_iters,
            cfg.n_inner)
        return lax.map(f, (T0.reshape(shp), frozen.reshape(shp),
                           s_in.reshape(shp))).reshape((B,) + grid.shape)

    # Parity first (bit-exact expected TPU-vs-TPU across kernel variants).
    Tg = jax.jit(solve_gridbatch)(s).reshape((B,) + grid.shape)
    Tp = jax.jit(solve_perpair)(s)
    err = float(jnp.max(jnp.abs(Tg - Tp)))
    print(json.dumps({"parity_max_abs_diff": err, "B": B, "P": P}),
          flush=True)
    # This tool is the only at-scale coverage of the gridbatch per-block
    # done-skip path — fail loudly on a correctness regression rather than
    # timing a wrong kernel (ADVICE r3). Tol: the kernels differ only in
    # batching/early-stop order, so agreement should be at fp32 rounding
    # scale (measured 3e-5 abs on T~60 fields, ~5e-7 rel), far under the
    # 1e-3 solve tol.
    assert err <= 1e-4, f"gridbatch/perpair parity broke: {err}"

    def timed(fn, K):
        @jax.jit
        def loop(s0):
            def body(i, carry):
                s_i, acc = carry
                T = fn(s_i).reshape((B,) + grid.shape)
                # data dependence so iterations cannot fuse/elide
                acc = acc + jnp.max(T)
                s_i = s_i + 1e-9 * acc
                return s_i, acc
            _, acc = lax.fori_loop(0, K, body, (s0, jnp.float32(0)))
            return acc
        r = loop(s)  # compile + run
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(s))
        return time.perf_counter() - t0

    for name, fn in (("gridbatch", solve_gridbatch),
                     ("perpair_laxmap", solve_perpair)):
        t2, t6 = timed(fn, 2), timed(fn, 6)
        per_batch = (t6 - t2) / 4.0
        print(json.dumps({
            "path": name,
            "ms_per_batch_solve": round(per_batch * 1e3, 2),
            "ms_per_field": round(per_batch * 1e3 / B, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
