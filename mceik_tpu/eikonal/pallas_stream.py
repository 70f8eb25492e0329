"""Streaming batched Pallas eikonal sweeps — the throughput kernel
(SURVEY.md §2.2 N1-N3, §6 "speed-of-light" row).

Motivation: the whole-field-in-VMEM kernel (pallas_sweep.py) is
latency-optimal for ONE field, but a sampler step wants 50-100 fields
(chains x stations) and its (64, 64) plane updates fill only half a lane
tile — measured ~2.9 ms/field batched. This kernel instead lays the batch
out in the LANE dimension — fields stored ``(n0, n1[, n2], B)`` — so every
plane update is a ``(n1, n2, B)`` op with up to 128 lanes busy, and streams
planes through VMEM:

- ``grid=(n0,)`` marches over planes; Mosaic double-buffers the plane DMAs
  (current, next-old, slowness, seed-floor) automatically;
- the Gauss-Seidel dependency (just-updated previous plane) lives in a
  VMEM scratch buffer that persists across sequential grid steps
  (``dimension_semantics=("arbitrary",)`` keeps the grid sequential);
- the backward march is the same kernel with reversed index maps.

Batches larger than fit VMEM blocks (B > 64 at 64^2 planes) are chunked.
An outer ``jax.custom_batching.custom_vmap`` rule collapses any vmapped
axis (chains, stations) into the lane batch, so ``vmap(vmap(solve))``
feeds ONE wide kernel instead of nesting sequential grids.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mceik_tpu.eikonal.godunov import BIG, local_solve, neighbor_min

# Two VMEM budgets shape the kernel:
# - the per-tile *stack* of ~40 live branchless-local-solve temporaries
#   (measured: 512KB tiles demanded a 22MB stack), bounded by tiling each
#   plane into slabs of <= ~128KB;
# - the persistent prev-plane scratch (one full lane-batched plane),
#   bounded by capping the lane chunk so a plane stays <= ~4MB.
_BLOCK_BYTES_TARGET = 1 << 17   # per-tile target (stack driver)
_SCRATCH_BYTES_TARGET = 1 << 22  # full-plane scratch cap (lane driver)


def _lane_chunk(plane_elems: int) -> int:
    b = max(8, _SCRATCH_BYTES_TARGET // (plane_elems * 4))
    return min(128, int(b) & ~7)  # multiple of 8, full lane tile at best


def _plane_update_batched(Tp, a_ax, sp, floor_p, spacing, n_inner):
    """Plane update with trailing lane-batch dim. ``Tp``: (n1[, n2], B);
    spatial dims are all but the last."""
    n_spatial = Tp.ndim - 1
    for _ in range(n_inner):
        a = [a_ax] + [neighbor_min(Tp, d) for d in range(n_spatial)]
        # local_solve is elementwise; the trailing B dim rides along. It
        # expects len(a) == "D" spacings: swept axis first, then plane.
        Tp = jnp.minimum(Tp, local_solve(a, spacing, sp))
        Tp = jnp.maximum(Tp, floor_p)
    return Tp


def _stream_kernel(T_cur_ref, T_next_ref, s_ref, floor_ref, out_ref,
                   prev_scratch, *, spacing, n_inner, slab):
    """Process one (plane, slab) tile. Grid order is (plane outer, slab
    inner), so by the time plane i runs, scratch holds ALL of plane i-1.

    The kernel's VMEM *stack* holds ~40 live plane-sized temporaries from
    the branchless local solve — that stack, not the block buffers, is
    what bounds the tile size (measured 22MB for full 512KB planes), hence
    slab tiling. In-plane neighbor propagation across slab seams is
    sacrificed within a sweep; the fixed point is unaffected because each
    axis's neighbors are read exactly (as prev/next planes) when that axis
    is the swept one.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile_shape = T_cur_ref.shape[1:]
    big = jnp.full(tile_shape, BIG, jnp.float32)

    prev = jnp.where(i == 0, big, prev_scratch[pl.ds(j * slab, slab)])
    a_ax = jnp.minimum(prev, T_next_ref[0])

    Tp = _plane_update_batched(T_cur_ref[0], a_ax, s_ref[0], floor_ref[0],
                               spacing, n_inner)
    out_ref[0] = Tp
    prev_scratch[pl.ds(j * slab, slab)] = Tp


def _choose_slab(n1: int, rest_elems: int) -> int:
    """Largest divisor of n1 keeping tile bytes <= the stack target."""
    cap = max(1, _BLOCK_BYTES_TARGET // (rest_elems * 4))
    best = 1
    for d in range(1, n1 + 1):
        if n1 % d == 0 and d <= cap:
            best = d
    return best


@functools.partial(jax.jit,
                   static_argnames=("spacing", "n_inner", "reverse",
                                    "interpret"))
def _sweep_axis0_streamed_chunk(T, s, floor, spacing, n_inner: int,
                                reverse: bool, interpret: bool = False):
    """One directional sweep along axis 0. Layout: (n0, n1[, n2], B)."""
    n0, n1 = T.shape[0], T.shape[1]
    rest = 1
    for d in T.shape[2:]:
        rest *= d
    slab = _choose_slab(n1, rest)
    n_slabs = n1 // slab
    blk = (1, slab) + T.shape[2:]
    zeros = (0,) * (T.ndim - 2)
    big_plane = jnp.full_like(T[:1], BIG)

    if reverse:
        # March plane p = n0-1 .. 0; "next old" plane is p-1. Pre-shifted
        # in XLA so every index map stays affine (clamped maps defeat the
        # pipeliner).
        cur_idx = lambda i, j: (n0 - 1 - i, j) + zeros
        T_next = jnp.concatenate([big_plane, T[:-1]], axis=0)
    else:
        cur_idx = lambda i, j: (i, j) + zeros
        T_next = jnp.concatenate([T[1:], big_plane], axis=0)

    kernel = functools.partial(_stream_kernel, spacing=spacing,
                               n_inner=n_inner, slab=slab)
    return pl.pallas_call(
        kernel,
        grid=(n0, n_slabs),
        in_specs=[pl.BlockSpec(blk, cur_idx, memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(blk, cur_idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(T.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(T.shape[1:], jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(T, T_next, s, floor)


def _sweep_axis0_streamed(T, s, floor, spacing, n_inner, reverse,
                          interpret=False):
    """Chunk the lane batch so VMEM blocks stay bounded."""
    B = T.shape[-1]
    plane_elems = 1
    for d in T.shape[1:-1]:
        plane_elems *= d
    chunk = _lane_chunk(plane_elems)
    if B <= chunk:
        return _sweep_axis0_streamed_chunk(T, s, floor, spacing, n_inner,
                                           reverse, interpret)
    outs = []
    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        sl = (Ellipsis, slice(lo, hi))
        outs.append(_sweep_axis0_streamed_chunk(
            T[sl], s[sl], floor[sl], spacing, n_inner, reverse, interpret))
    return jnp.concatenate(outs, axis=-1)


def _cycle_batched(T, s, floor, spacing, n_inner, interpret=False):
    """Full cycle: both directions along every spatial axis. Layout
    (n0, n1[, n2], B); spatial axis rotations never touch the lane dim."""
    D = T.ndim - 1
    for axis in range(D):
        perm = (axis,) + tuple(d for d in range(D) if d != axis) + (D,)
        inv = tuple(perm.index(i) for i in range(D)) + (D,)
        sp = tuple(spacing[p] for p in perm[:-1])
        Tt = jnp.transpose(T, perm)
        st = jnp.transpose(s, perm)
        ft = jnp.transpose(floor, perm)
        Tt = _sweep_axis0_streamed(Tt, st, ft, sp, n_inner, False, interpret)
        Tt = _sweep_axis0_streamed(Tt, st, ft, sp, n_inner, True, interpret)
        T = jnp.transpose(Tt, inv)
    return T


def sweep_solve_pallas_batched(T0, frozen, s, spacing, tol, max_cycles,
                               n_inner: int = 2, interpret: bool = False):
    """Batched fixed-point solve. Inputs are batch-LEADING ``(B, *grid)``
    (the natural JAX layout); converted to lane-minor internally."""
    B = T0.shape[0]
    D = T0.ndim - 1
    to_lane = tuple(range(1, D + 1)) + (0,)
    to_batch = (D,) + tuple(range(D))

    Tl = jnp.transpose(T0, to_lane)
    sl_ = jnp.transpose(jnp.broadcast_to(s, T0.shape), to_lane)
    fl = jnp.transpose(jnp.where(frozen, T0, 0.0).astype(jnp.float32), to_lane)

    def cond(carry):
        _, delta, it = carry
        return jnp.logical_and(delta > tol, it < max_cycles)

    def body(carry):
        T, _, it = carry
        T_new = _cycle_batched(T, sl_, fl, spacing, n_inner, interpret)
        delta = jnp.max(jnp.abs(T_new - T))
        return T_new, delta, it + 1

    Tl, _, _ = lax.while_loop(
        cond, body, (Tl, jnp.asarray(jnp.inf, jnp.float32), 0))
    return jnp.transpose(Tl, to_batch)
