"""Pallas TPU kernel for the adjoint transport sweep (SURVEY.md §3.3
"ADJOINT sweep ← HOT"; the backward half of differentiable traveltimes).

Same whole-field-in-VMEM bidirectional plane-GS structure as the forward
kernel (pallas_sweep.py), but the plane update is the LINEAR gather

    lam[i] = g[i] + axial(lam[i-1], lam[i+1]) + inplane(lam[i])

with per-axis SIGNED upwind weights (adjoint_sweep.transport_weights).
Operand budget: lam-in, g, D weight fields, lam-out — 6 whole fields for
3-D, which at 64^3 (2 MB padded each) still fits VMEM without double
buffering. Lane packing (P fields in the 128-wide registers, seam-masked
sends) works exactly as in the forward kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mceik_tpu.eikonal.godunov import shift_filled
from mceik_tpu.eikonal.pallas_sweep import _pack, _pack_perms, _repack, _unpack


def _seam_zero(x, axis, n_seg, side):
    """Zero out send-values that would cross a lane-pack seam after a
    ``side``-direction shift (side=+1: send to j=i-1 crosses at segment
    starts; side=-1: send to j=i+1 crosses at segment ends)."""
    if n_seg == 1:
        return x
    seg = x.shape[axis] // n_seg
    col = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if side == +1:
        return jnp.where(col % seg == 0, 0.0, x)
    return jnp.where(col % seg == seg - 1, 0.0, x)


def _inplane_collect(lam_p, ws_plane, n_seg):
    out = jnp.zeros_like(lam_p)
    last = lam_p.ndim - 1
    for d, ws in enumerate(ws_plane):
        send_lo = jnp.where(ws > 0, ws, 0.0) * lam_p
        send_hi = jnp.where(ws < 0, -ws, 0.0) * lam_p
        # out[j] += send_lo[j+1] ; out[j] += send_hi[j-1]
        lo_sh = shift_filled(send_lo, d, +1, 0.0)
        hi_sh = shift_filled(send_hi, d, -1, 0.0)
        if d == last:
            lo_sh = _seam_zero(lo_sh, d, n_seg, -1)
            hi_sh = _seam_zero(hi_sh, d, n_seg, +1)
        out += lo_sh + hi_sh
    return out


def _transport_axis0_kernel(lam_ref, g_ref, *ws_and_out, n_inner: int,
                            n_seg: int, halo: bool = False,
                            pin_dim: int = -1):
    ws_refs = ws_and_out[:-1]
    out_ref = ws_and_out[-1]
    n0 = lam_ref.shape[0]
    # halo=True: first/last planes are fixed boundary values from
    # neighboring blocks (blocked big-field solve) — read, never updated.
    # pin_dim >= 0: same pinning for transverse sweeps of a blocked solve,
    # where the block-partitioned axis is a PLANE dim: the first/last rows
    # of that dim are restored from lam_ref (the injected halo values)
    # after each plane update, so interior updates read correct boundary
    # data and halo rows never drift (linear-system analog of the forward
    # kernel's monotone floor pinning).
    lo, hi = (1, n0 - 1) if halo else (0, n0)

    out_ref[...] = lam_ref[...]

    def update_plane_at(i):
        # NOTE: edge guards are arithmetic masks in the ``i >= 1`` form:
        # on this backend, strict ``i > 0`` on a fori_loop index inside a
        # Pallas kernel evaluates True at i == 0 (bisected: ``i >= 1``,
        # ``i != 0``, ``(i-1) >= 0`` are all correct, every ``> 0`` spelling
        # is not; see docs/ARCHITECTURE.md platform notes). The forward
        # sweep kernel is provably immune to the resulting self-read (a
        # self-neighbor candidate is >= self, so its monotone min discards
        # it) — this linear transport is not, so the guards must be exact.
        has_prev = (i >= 1).astype(jnp.float32)
        has_next = (i <= n0 - 2).astype(jnp.float32)
        prev_l = out_ref[jnp.maximum(i - 1, 0)]
        nxt_l = out_ref[jnp.minimum(i + 1, n0 - 1)]
        prev_w = ws_refs[0][jnp.maximum(i - 1, 0)]
        nxt_w = ws_refs[0][jnp.minimum(i + 1, n0 - 1)]
        # consumer at i-1 sends here iff it chose HIGH (ws<0); at i+1 iff LOW.
        axial = (has_prev * jnp.where(prev_w < 0, -prev_w, 0.0) * prev_l
                 + has_next * jnp.where(nxt_w > 0, nxt_w, 0.0) * nxt_l)
        base = g_ref[i] + axial
        lam_p = out_ref[i]
        ws_plane = [w[i] for w in ws_refs[1:]]

        def pin(p):
            # Restore the halo rows from lam_ref (the injected boundary
            # values) so no micro-iteration ever reads a drifted halo.
            if pin_dim == 0:
                orig = lam_ref[i]
                return jnp.concatenate([orig[:1], p[1:-1], orig[-1:]], 0)
            if pin_dim == 1:
                orig = lam_ref[i]
                return jnp.concatenate(
                    [orig[:, :1], p[:, 1:-1], orig[:, -1:]], 1)
            return p

        for _ in range(n_inner):
            lam_p = pin(base + _inplane_collect(lam_p, ws_plane, n_seg))
        out_ref[i] = lam_p

    def fwd_body(i, _):
        update_plane_at(i)
        return 0

    lax.fori_loop(lo, hi, fwd_body, 0)

    def bwd_body(k, _):
        update_plane_at(n0 - 1 - k)
        return 0

    lax.fori_loop(n0 - hi, n0 - lo, bwd_body, 0)


@functools.partial(jax.jit, static_argnames=("n_inner", "interpret", "n_seg",
                                              "halo", "pin_dim"))
def transport_axis0(lam, g, ws, n_inner: int = 2, interpret: bool = False,
                    n_seg: int = 1, halo: bool = False, pin_dim: int = -1):
    """One bidirectional transport sweep along axis 0; ``ws`` is the tuple
    of signed weight fields ORDERED with the swept axis first."""
    kernel = functools.partial(_transport_axis0_kernel, n_inner=n_inner,
                               n_seg=n_seg, halo=halo, pin_dim=pin_dim)
    n_in = 2 + len(ws)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(lam.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lam, g, *ws)


def transport_cycle_pallas(lam, g, wsigned, n_inner: int = 2,
                           interpret: bool = False):
    """One full cycle: bidirectional transport sweeps along every axis
    (axis brought to the front by transpose, like the forward cycle)."""
    D = lam.ndim
    for axis in range(D):
        perm = (axis,) + tuple(d for d in range(D) if d != axis)
        inv = tuple(int(i) for i in np.argsort(perm))
        lam_t = transport_axis0(
            jnp.transpose(lam, perm), jnp.transpose(g, perm),
            tuple(jnp.transpose(wsigned[p], perm) for p in perm),
            n_inner, interpret)
        lam = jnp.transpose(lam_t, inv)
    return lam


def _transport_block_cycle(lam_ext, g_ext, ws_ext, n_inner, interpret):
    """One full sweep cycle on an axis-0-extended block: the axis-0 sweep
    skips the halo planes (halo=True); transverse sweeps pin the halo rows
    of the block-partitioned dim (pin_dim=0 after transposition)."""
    D = lam_ext.ndim
    for axis in range(D):
        perm = (axis,) + tuple(d for d in range(D) if d != axis)
        inv = tuple(int(i) for i in np.argsort(perm))
        lam_t = transport_axis0(
            jnp.transpose(lam_ext, perm), jnp.transpose(g_ext, perm),
            tuple(jnp.transpose(ws_ext[p], perm) for p in perm),
            n_inner, interpret,
            halo=(axis == 0), pin_dim=(-1 if axis == 0 else 0))
        lam_ext = jnp.transpose(lam_t, inv)
    return lam_ext


def _transport_block_pass(lam, g, wsigned, n_inner, n_blocks, ascending,
                          interpret):
    """Gauss-Seidel pass over axis-0 blocks of the transport system, each
    block solved by the fused kernel cycle with 1-plane halos injected
    from the current global state (zeros at the outer grid edges — no
    consumers exist beyond the grid)."""
    blk = lam.shape[0] // n_blocks

    def body(i, lam):
        k = i if ascending else n_blocks - 1 - i
        lo = k * blk

        def ext(x, pad_val=0.0):
            x_blk = lax.dynamic_slice_in_dim(x, lo, blk, axis=0)
            zeros = jnp.full_like(x_blk[:1], pad_val)
            h_lo = jnp.where(k == 0, zeros,
                             lax.dynamic_slice_in_dim(
                                 x, jnp.maximum(lo - 1, 0), 1, axis=0))
            h_hi = jnp.where(k == n_blocks - 1, zeros,
                             lax.dynamic_slice_in_dim(
                                 x, jnp.minimum(lo + blk, x.shape[0] - 1),
                                 1, axis=0))
            return jnp.concatenate([h_lo, x_blk, h_hi], axis=0)

        lam_ext = ext(lam)
        g_ext = ext(g)
        ws_ext = tuple(ext(w) for w in wsigned)
        lam_new_ext = _transport_block_cycle(lam_ext, g_ext, ws_ext,
                                             n_inner, interpret)
        return lax.dynamic_update_slice_in_dim(lam, lam_new_ext[1:-1], lo,
                                               axis=0)

    return lax.fori_loop(0, n_blocks, body, lam)


def transport_solve_pallas_blocked(g, wsigned, tol, max_cycles: int,
                                   n_inner: int = 2, interpret: bool = False,
                                   n_blocks: int = None):
    """Blocked big-field transport solve (the adjoint counterpart of
    sweep_solve_pallas_blocked): axis 0 split into VMEM-sized blocks,
    ascending+descending block-GS per cycle, halo planes injected from the
    global state and pinned during the local cycle. Same fixed point as
    the unblocked solver (parity-tested)."""
    from mceik_tpu.eikonal.pallas_sweep import MAX_VMEM_FIELD_BYTES

    if n_blocks is None:
        field_bytes = 4 * int(np.prod(g.shape))
        n_blocks = 1
        # 6 whole-field operands (vs the forward's 4): half the block size.
        while field_bytes // n_blocks > MAX_VMEM_FIELD_BYTES // 4:
            n_blocks *= 2
    if g.shape[0] % n_blocks != 0 or n_blocks >= g.shape[0]:
        raise ValueError(
            f"axis 0 ({g.shape[0]}) not divisible into {n_blocks} blocks")

    from mceik_tpu.eikonal.adjoint_sweep import _flagged_cycle_loop

    def cycle(lam):
        lam_new = _transport_block_pass(lam, g, wsigned, n_inner, n_blocks,
                                        True, interpret)
        return _transport_block_pass(lam_new, g, wsigned, n_inner,
                                     n_blocks, False, interpret)

    return _flagged_cycle_loop(cycle, g, tol, max_cycles)


def transport_solve_pallas_packed(g, wsigned, tol, max_cycles: int,
                                  n_inner: int = 2,
                                  interpret: bool = False):
    """Lane-packed batched transport solve: ``g`` is ``(P,) + field``,
    ``wsigned`` a D-tuple of ``(P,) + field`` signed weights. Solves all P
    systems jointly (shared convergence), packed into the 128-wide lanes.

    Loop-invariant packing (g and the weights never change across cycles)
    is hoisted, mirroring sweep_solve_pallas_packed."""
    P = g.shape[0]
    D = g.ndim - 1
    g_packed, ws_packed = [], []
    for axis in range(D):
        perm, sperm, _ = _pack_perms(D, axis)
        g_packed.append(_pack(g, sperm))
        ws_packed.append(tuple(_pack(wsigned[p], sperm) for p in perm))

    def cycle(lam_p):
        # lam stays resident in packed layouts; one fused _repack per
        # axis transition instead of unpack+pack (see pallas_sweep.py's
        # sweep_cycle_pallas_packed — the same transpose-tax fix).
        for axis in range(D):
            lam_p = transport_axis0(lam_p, g_packed[axis], ws_packed[axis],
                                    n_inner, interpret, n_seg=P)
            lam_p = _repack(lam_p, P, axis, (axis + 1) % D)
        return lam_p

    from mceik_tpu.eikonal.adjoint_sweep import _flagged_cycle_loop

    _, sperm0, inv_sperm0 = _pack_perms(D, 0)
    lam = _flagged_cycle_loop(cycle, g_packed[0], tol, max_cycles,
                              g_scale=jnp.max(jnp.abs(g)))
    return _unpack(lam, P, inv_sperm0)
