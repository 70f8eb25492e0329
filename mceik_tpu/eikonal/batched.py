"""Public batched eikonal solve with vmap-merging (SURVEY.md §3.2's
"station-batched solves" — the per-proposal hot loop).

``solve_eikonal_batched`` solves one traveltime field per source over a
shared (or per-source) slowness field. Its ``jax.custom_batching.custom_vmap``
rule COLLAPSES any outer ``vmap`` axis (chains, events, ...) into the flat
batch, so a sampler's ``vmap_chains(vmap_stations(solve))`` reaches the
backend as ONE rank-1 batch. This matters twice:

1. Throughput — the lane-packed field kernels want the whole chains x
   stations batch at once to fill the 128-wide vector lanes
   (pallas_sweep.py; a streaming lane-batched variant was tried and
   removed 2026-08-19 — it exceeded the 16 MB scoped-VMEM limit at the
   flagship 64^3 shape, see BASELINE.md).
2. Correctness — the axon/XLA:TPU backend MISCOMPILES doubly-vmapped
   ``lax.scan``-based sweeps (verified: vmap^2 of the sweep solver returns
   a self-consistent but wrong fixed point on TPU, max err ~33 on a 64^3
   test, while the identical program on CPU is bit-exact vs single-vmap).
   Flattening at this boundary means the suspect pattern never reaches the
   compiler. Seeding also happens INSIDE the boundary for the same reason.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mceik_tpu.eikonal.solve import (EikonalConfig, _sweep_solve, _jacobi_solve,
                                     seed_source)
from mceik_tpu.grid import Grid


# The axon/XLA:TPU backend MISCOMPILES the vmapped scan-based sweep above
# a batch threshold (deterministic wrong fixed point, max err ~33 on a
# 64^3 medium; the jacobi method and CPU are unaffected). The threshold
# MOVED with a toolchain update: r1's bisection found {8,16,24} exact and
# {32,64} wrong; re-bisected 2026-08-21 (tools/tpu_sanity.py caught it),
# {4,8} are exact and {16} is wrong. Chunk at 8 — and keep tpu_sanity in
# the round loop, since this is environment-version-dependent behavior.
_SAFE_XLA_SWEEP_BATCH = 8


def _flat_solve_xla(T0, frozen, s, grid, config):
    """Rank-1-batched XLA solve over the flat batch, chunked to stay under
    the backend's miscompilation threshold (see above)."""
    if config.method == "jacobi":
        f = lambda T0_, fr_, s_: _jacobi_solve(T0_, fr_, s_, grid.spacing,
                                               config.tol, config.max_iters)
    else:
        f = lambda T0_, fr_, s_: _sweep_solve(T0_, fr_, s_, grid.spacing,
                                              config.tol, config.max_iters,
                                              config.n_inner)
    B = T0.shape[0]
    # The miscompilation is TPU-specific; on CPU (tests, multihost dryrun)
    # chunking would only bloat the traced graph.
    chunk = _SAFE_XLA_SWEEP_BATCH if jax.default_backend() == "tpu" else B
    if B <= chunk:
        return jax.vmap(f)(T0, frozen, s)
    outs = []
    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        outs.append(jax.vmap(f)(T0[lo:hi], frozen[lo:hi], s[lo:hi]))
    return jnp.concatenate(outs, axis=0)


@functools.lru_cache(maxsize=64)
def _core_solver(grid: Grid, config: EikonalConfig, impl: str,
                 interpret: bool):
    """Build (and cache) the custom_vmap'd flat solver for a grid+config.

    The core takes ``(srcs (B, D), s (B,) + grid.shape)`` and performs
    seeding + solve entirely inside the flattening boundary.
    """

    @jax.custom_batching.custom_vmap
    def solve_core(srcs, s):
        T0, frozen = jax.vmap(
            lambda x, sf: seed_source(sf, x, grid, config.seed_radius)
        )(srcs, s)
        if impl == "field":
            # Whole-field-in-VMEM kernel, sequenced with lax.map rather
            # than vmap: vmapping a pallas_call adds batch grid dims whose
            # blocks Mosaic multi-buffers (prefetching the next field while
            # computing the current one), which pushed the 64^3 case ~80KB
            # over the 16MB scoped-VMEM limit in some surrounding contexts.
            # lax.map keeps exactly one working set resident at a dispatch
            # cost that is noise next to the per-field solve. Measured
            # correct at any batch size (the only fast TPU path that is —
            # see the backend-miscompilation note above).
            #
            # Fields narrower than the 128-wide vector lanes are LANE-
            # PACKED P at a time (pallas_sweep.sweep_solve_pallas_packed):
            # the VMEM padding the unpacked kernel wastes on 64^3/32^3
            # grids instead holds P independent fields, ~P-x throughput.
            from mceik_tpu.eikonal.pallas_sweep import (
                lane_pack_factor, sweep_solve_pallas,
                sweep_solve_pallas_2d_lanebatched, sweep_solve_pallas_packed)

            if grid.ndim == 2:
                # 2-D fields (configs 1/4): whole batch in the lane dim,
                # all fields marched in lockstep — per-field kernels are
                # dispatch-bound at SMC batch sizes.
                return sweep_solve_pallas_2d_lanebatched(
                    T0, frozen, s, grid.spacing, config.tol,
                    config.max_iters, config.n_inner, interpret=interpret)

            # 3-D default: per-pair lane-packed solves sequenced with
            # lax.map. The grid-batched whole-batch-in-one-pallas_call
            # variant (impl="gridbatch" below) was the r3 default on the
            # strength of a 24% win at B=2, but at the production B=128
            # shape it measures 23% SLOWER than this path even with
            # per-block early stopping (167.5 vs 136.3 ms/batch,
            # tools/gridbatch_compare.py 2026-08-20, BASELINE.md): each
            # per-pair solve runs exactly its own cycle count, while the
            # batched while_loop runs every block to the slowest block's
            # count (done blocks still stream HBM as pass-throughs) and
            # recomputes seeds in-kernel. Reverted per VERDICT r3 #1a.
            B = T0.shape[0]
            P = lane_pack_factor(grid.shape)
            if P > 1:
                # Fractional source index coords ride along so cube grids
                # take the single-pallas_call fused cycle (fused012 —
                # in-kernel floor reconstruction; bit-exact).
                src_idx = jax.vmap(grid.to_index_coords)(srcs)
                pad = (-B) % P
                if pad:
                    T0p = jnp.concatenate([T0, T0[-1:].repeat(pad, 0)], 0)
                    frp = jnp.concatenate(
                        [frozen, frozen[-1:].repeat(pad, 0)], 0)
                    sp_ = jnp.concatenate([s, s[-1:].repeat(pad, 0)], 0)
                    sip = jnp.concatenate(
                        [src_idx, src_idx[-1:].repeat(pad, 0)], 0)
                else:
                    T0p, frp, sp_, sip = T0, frozen, s, src_idx
                shp = (-1, P) + grid.shape
                f = lambda args: sweep_solve_pallas_packed(
                    args[0], args[1], args[2], grid.spacing, config.tol,
                    config.max_iters, config.n_inner, interpret=interpret,
                    src_idx=args[3], seed_radius=config.seed_radius)
                out = jax.lax.map(f, (T0p.reshape(shp), frp.reshape(shp),
                                      sp_.reshape(shp),
                                      sip.reshape((-1, P, grid.ndim))))
                return out.reshape((-1,) + grid.shape)[:B]

            f = lambda args: sweep_solve_pallas(
                args[0], args[1], args[2], grid.spacing, config.tol,
                config.max_iters, config.n_inner, interpret=interpret)
            return jax.lax.map(f, (T0, frozen, s))
        if impl == "gridbatch":
            # Grid-batched lane-packed solve: the WHOLE batch in one
            # pallas_call per axis sweep (batch on the Pallas grid, Mosaic
            # revolving-buffers per-pair blocks, per-block done-skip).
            # Wins at small batches (+24% at B=2) where launch gaps
            # dominate; LOSES at the flagship B=128 (see the field-branch
            # comment), so it is opt-in, not the default.
            from mceik_tpu.eikonal.pallas_sweep import (
                lane_pack_factor, sweep_solve_pallas_gridbatch)

            B = T0.shape[0]
            P = max(1, lane_pack_factor(grid.shape))
            pad = (-B) % P
            if pad:
                T0 = jnp.concatenate([T0, T0[-1:].repeat(pad, 0)], 0)
                s = jnp.concatenate([s, s[-1:].repeat(pad, 0)], 0)
                srcs_p = jnp.concatenate([srcs, srcs[-1:].repeat(pad, 0)], 0)
            else:
                srcs_p = srcs
            shp = (-1, P) + grid.shape
            src_idx = jax.vmap(grid.to_index_coords)(srcs_p)
            s_src = jax.vmap(lambda sf, si: jax.scipy.ndimage.map_coordinates(
                sf, [si[d] for d in range(grid.ndim)], order=1,
                mode="nearest"))(s, src_idx)
            out = sweep_solve_pallas_gridbatch(
                T0.reshape(shp), s.reshape(shp),
                src_idx.reshape((-1, P, grid.ndim)), s_src.reshape((-1, P)),
                grid.shape, grid.spacing, config.seed_radius, config.tol,
                config.max_iters, config.n_inner, interpret=interpret)
            return out[:B]
        if impl == "blocked":
            # Large fields (128^3+): axis-0 block Gauss-Seidel, each block
            # solved by the fused VMEM kernel (pallas_sweep.py).
            from mceik_tpu.eikonal.pallas_sweep import sweep_solve_pallas_blocked

            f = lambda args: sweep_solve_pallas_blocked(
                args[0], args[1], args[2], grid.spacing, config.tol,
                config.max_iters, config.n_inner, interpret=interpret)
            return jax.lax.map(f, (T0, frozen, s))
        return _flat_solve_xla(T0, frozen, s, grid, config)

    @solve_core.def_vmap
    def _rule(axis_size, in_batched, srcs, s):
        def ensure(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        srcs_b = ensure(srcs, in_batched[0])
        s_b = ensure(s, in_batched[1])
        inner = srcs_b.shape[1]

        def flat(x):
            return x.reshape((axis_size * inner,) + x.shape[2:])

        out = solve_core(flat(srcs_b), flat(s_b))
        return out.reshape((axis_size, inner) + out.shape[1:]), True

    return solve_core


def solve_eikonal_batched(slowness, srcs, grid: Grid,
                          config: EikonalConfig = EikonalConfig(),
                          impl: str = "field",
                          interpret: bool = False):
    """Solve from ``(B, D)`` source coords; ``slowness`` is grid-shaped
    (shared) or ``(B,) + grid.shape`` (per-source). Returns
    ``(B,) + grid.shape`` traveltime fields.

    impl: "field" (whole-field-in-VMEM lane-packed Pallas kernels,
    per-pair lax.map — the production default), "gridbatch" (whole batch
    in one pallas_call per axis; faster only at small batches, see the
    branch comment), "blocked" (axis-0 block GS for 128^3-class fields),
    or "xla" (rank-1 vmapped XLA sweep — also the safe TPU fallback, see
    module docstring).
    """
    slowness = jnp.asarray(slowness, jnp.float32)
    B = srcs.shape[0]
    if slowness.ndim == grid.ndim:
        s_b = jnp.broadcast_to(slowness, (B,) + grid.shape)
    else:
        s_b = slowness
    solver = _core_solver(grid, config, impl, interpret)
    return solver(srcs, s_b)
