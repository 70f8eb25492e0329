"""Probe for the fused axis-0+1 sweep kernel (the r4->r5 launch-gap
lever, BASELINE.md 2026-08-21): parity vs the two-call path, then
marginal-slope timing of the full packed solve with a fused cycle
(2 pallas_calls/cycle) vs the production cycle (3 calls/cycle).

    python tools/fused01_probe.py --interpret          # CPU parity only
    python tools/fused01_probe.py [--batch 128]        # on-chip timing
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
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode parity check only")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from mceik_tpu.eikonal.pallas_sweep import (
        _pack, _pack_perms, _repack, lane_pack_factor, sweep_axes01_fused,
        sweep_axis0, sweep_solve_pallas_packed)
    from mceik_tpu.eikonal.solve import EikonalConfig, seed_source
    from mceik_tpu.grid import Grid

    n = 16 if args.interpret else args.n
    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    cfg = EikonalConfig(tol=1e-3, max_iters=20, n_inner=4)
    P = lane_pack_factor(grid.shape)
    interp = args.interpret

    key = jax.random.PRNGKey(0)
    T0s, frs, ss = [], [], []
    for i in range(P):
        k = jax.random.fold_in(key, i)
        s = jnp.exp(0.1 * jax.random.normal(k, grid.shape)).astype(jnp.float32)
        src = jnp.asarray([3.0 + i % 5, 4.0, 5.0 + i % 7], jnp.float32)
        T0, fr = seed_source(s, src, grid, cfg.seed_radius)
        T0s.append(T0), frs.append(fr), ss.append(s)
    T0 = jnp.stack(T0s)
    frozen = jnp.stack(frs)
    s = jnp.stack(ss)
    floor = jnp.where(frozen, T0, 0.0).astype(jnp.float32)

    s_packed, f_packed = [], []
    for axis in range(3):
        _, sperm, _ = _pack_perms(3, axis)
        s_packed.append(_pack(s, sperm))
        f_packed.append(_pack(floor, sperm))
    _, sperm0, _ = _pack_perms(3, 0)
    Tp0 = _pack(T0, sperm0)
    sp = grid.spacing

    # --- parity: fused01 == sweep_axis0(a0) -> repack(0,1) -> sweep_axis0(a1)
    fused = sweep_axes01_fused(Tp0, s_packed[0], f_packed[0], s_packed[1],
                               f_packed[1], sp, cfg.n_inner,
                               interpret=interp, n_seg=P)
    ref = sweep_axis0(Tp0, s_packed[0], f_packed[0],
                      (sp[0], sp[1], sp[2]), cfg.n_inner, interp, n_seg=P)
    ref = _repack(ref, P, 0, 1)
    ref = sweep_axis0(ref, s_packed[1], f_packed[1],
                      (sp[1], sp[0], sp[2]), cfg.n_inner, interp, n_seg=P)
    err = float(jnp.max(jnp.abs(fused - ref)))
    print(json.dumps({"parity_fused01_vs_twocall": err, "n": n, "P": P}),
          flush=True)
    assert err == 0.0 or err < 1e-5, err
    if args.interpret:
        return

    # --- timing: full packed solve, fused cycle vs production cycle ------
    B = args.batch
    n_pairs = B // P
    kb = jax.random.split(jax.random.PRNGKey(1), 2)
    sb = jnp.exp(0.1 * jax.random.normal(kb[0], (B,) + grid.shape)) \
        .astype(jnp.float32)
    srcs = jax.random.uniform(kb[1], (B, 3), minval=4.0,
                              maxval=float(n - 4)).astype(jnp.float32)
    T0b, frb = jax.vmap(
        lambda x, sf: seed_source(sf, x, grid, cfg.seed_radius))(srcs, sb)
    shp = (n_pairs, P) + grid.shape

    def solve_pair_fused(T0p, frp, sp_):
        """sweep_solve_pallas_packed with the fused 2-call cycle."""
        floor_ = jnp.where(frp, T0p, 0.0).astype(jnp.float32)
        spk, fpk = [], []
        for axis in range(3):
            _, spm, _ = _pack_perms(3, axis)
            spk.append(_pack(sp_, spm))
            fpk.append(_pack(floor_, spm))
        _, sp0, inv0 = _pack_perms(3, 0)
        Tp = _pack(T0p, sp0)

        def cycle(Tp):
            Tp = sweep_axes01_fused(Tp, spk[0], fpk[0], spk[1], fpk[1],
                                    sp, cfg.n_inner, n_seg=P)
            Tp = _repack(Tp, P, 1, 2)
            Tp = sweep_axis0(Tp, spk[2], fpk[2], (sp[2], sp[0], sp[1]),
                             cfg.n_inner, n_seg=P)
            return _repack(Tp, P, 2, 0)

        def cond(c):
            _, d, it = c
            return jnp.logical_and(d > cfg.tol, it < cfg.max_iters)

        def body(c):
            Tp, _, it = c
            Tn = cycle(Tp)
            return Tn, jnp.max(jnp.abs(Tn - Tp)), it + 1

        Tp, _, _ = lax.while_loop(
            cond, body, (Tp, jnp.asarray(jnp.inf, jnp.float32), 0))
        from mceik_tpu.eikonal.pallas_sweep import _unpack
        return _unpack(Tp, P, inv0)

    def batch_fused(s_in):
        f = lambda a: solve_pair_fused(a[0], a[1], a[2])
        return lax.map(f, (T0b.reshape(shp), frb.reshape(shp),
                           s_in.reshape(shp))).reshape((B,) + grid.shape)

    def batch_prod(s_in):
        f = lambda a: sweep_solve_pallas_packed(
            a[0], a[1], a[2], sp, cfg.tol, cfg.max_iters, cfg.n_inner)
        return lax.map(f, (T0b.reshape(shp), frb.reshape(shp),
                           s_in.reshape(shp))).reshape((B,) + grid.shape)

    Tf = jax.jit(batch_fused)(sb)
    jax.block_until_ready(Tf)
    Tp_ = jax.jit(batch_prod)(sb)
    jax.block_until_ready(Tp_)
    err_b = float(jnp.max(jnp.abs(Tf - Tp_)))
    print(json.dumps({"parity_batch_solve": err_b, "B": B}), flush=True)
    assert err_b < 1e-4, err_b

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

    for name, fn in (("production_3call", batch_prod),
                     ("fused01_2call", batch_fused)):
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
