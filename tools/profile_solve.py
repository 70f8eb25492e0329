"""Marginal-slope breakdown of the packed Pallas eikonal solve on TPU.

Host timings through the tunnel carry ~50 ms fixed overhead (see
docs/ARCHITECTURE.md), so every stage is timed as the SLOPE of wall time
vs repetition count of a dependency-chained `lax.fori_loop` running on
device, with a scalar readback.

Stages measured for the bench-shaped 64^3 packed (P=2) solve:
  - full fixed-point solve (while_loop of cycles)
  - one full cycle (3 axes: kernel + fused _repack transition each)
  - one axis kernel (sweep_axis0, packed layout, no transposes)
  - the 3 fused layout transitions alone
  - converged cycle count at bench tol
  - a roofline figure: element-updates/s and fp32 op/s (op count taken
    from the jaxpr of one plane update, so it tracks the actual code),
    quoted against a stated single-issue 8x128-lane VPU reference.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mceik_tpu.grid import Grid
from mceik_tpu.eikonal.solve import seed_source
from mceik_tpu.eikonal import EikonalConfig
from mceik_tpu.eikonal import pallas_sweep as ps


def slope_time(make_loop, reps=(2, 10)):
    """Wall-time slope per iteration of a device-resident fori_loop."""
    outs = []
    for n in reps:
        f = jax.jit(make_loop(n))
        f()  # compile + warm
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        r = f()
        jax.block_until_ready(r)
        outs.append(time.perf_counter() - t0)
    return (outs[1] - outs[0]) / (reps[1] - reps[0])


def count_elementwise_ops(fn, *args):
    """Rough fp32 vector-op count per element: number of elementwise
    primitives in the jaxpr (each touches every element once)."""
    ELEMENTWISE = {
        "add", "sub", "mul", "div", "max", "min", "abs", "neg", "sqrt",
        "rsqrt", "lt", "le", "gt", "ge", "eq", "ne", "select_n", "and",
        "or", "not", "xor", "sign", "rem", "integer_pow", "exp", "log",
        "convert_element_type",
    }
    jaxpr = jax.make_jaxpr(fn)(*args)
    n = 0

    def walk(jpr):
        nonlocal n
        for eqn in jpr.eqns:
            prim = eqn.primitive.name
            if prim in ELEMENTWISE:
                n += 1
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
    walk(jaxpr.jaxpr)
    return n


def main():
    print("devices:", jax.devices())
    n = 64
    grid = Grid(shape=(n, n, n), spacing=(1.0, 1.0, 1.0))
    u = jax.image.resize(jax.random.normal(jax.random.PRNGKey(0), (12, 12, 12)),
                         grid.shape, "linear")
    s = jnp.exp(0.2 * u).astype(jnp.float32)
    src = jnp.asarray([7.0, 11.0, 13.0], jnp.float32)
    T0, frozen = seed_source(s, src, grid, 3.0)

    P = ps.lane_pack_factor(grid.shape)
    print("lane pack P =", P)
    T0st = jnp.stack([T0] * P)
    frst = jnp.stack([frozen] * P)
    sst = jnp.stack([s] * P)
    spacing = grid.spacing
    tol, max_cycles, n_inner = 1e-3, 40, 4

    seed_floor = jnp.where(frst, T0st, 0.0).astype(jnp.float32)
    s_packed, floor_packed = [], []
    for axis in range(3):
        _, sperm, _ = ps._pack_perms(3, axis)
        s_packed.append(ps._pack(sst, sperm))
        floor_packed.append(ps._pack(seed_floor, sperm))
    s_packed, floor_packed = tuple(s_packed), tuple(floor_packed)
    Tp0 = ps._pack(T0st, ps._pack_perms(3, 0)[1])

    # --- converged cycle count ---
    def count_cycles():
        def cond(c):
            _, d, it = c
            return jnp.logical_and(d > tol, it < max_cycles)

        def body(c):
            T, _, it = c
            Tn = ps.sweep_cycle_pallas_packed(T, s_packed, floor_packed,
                                              spacing, P, n_inner)
            return Tn, jnp.max(jnp.abs(Tn - T)), it + 1

        _, d, it = lax.while_loop(cond, body,
                                  (Tp0, jnp.asarray(jnp.inf, jnp.float32), 0))
        return d, it

    d, it = jax.jit(count_cycles)()
    print(f"cycles to tol={tol}: {int(it)} (final delta {float(d):.2e})")

    # --- full solve slope ---
    def mk_solve(reps):
        def run():
            def body(i, carry):
                T0x = T0st * (1.0 + 1e-9 * carry)
                T = ps.sweep_solve_pallas_packed(T0x, frst, sst, spacing, tol,
                                                 max_cycles, n_inner)
                return jnp.sum(T[0, 0, 0])
            return lax.fori_loop(0, reps, body, 0.0)
        return run

    t = slope_time(mk_solve)
    print(f"full packed solve ({P} fields): {t*1e6:9.1f} us  "
          f"-> {t*1e6/P:.1f} us/field")

    # --- one cycle slope (resident layouts: 3 kernels + 3 transitions) ---
    def mk_cycle(reps):
        def run():
            def body(i, T):
                return ps.sweep_cycle_pallas_packed(T, s_packed, floor_packed,
                                                    spacing, P, n_inner)
            return lax.fori_loop(0, reps, body, Tp0)[0, 0]
        return run

    t_cycle = slope_time(mk_cycle, reps=(4, 24))
    print(f"one cycle (3x kernel + 3x _repack): {t_cycle*1e6:9.1f} us")

    # --- one axis kernel slope (fixed packed layout, no transitions) ---
    def mk_axis(reps):
        def run():
            def body(i, T):
                return ps.sweep_axis0(T, s_packed[0], floor_packed[0],
                                      spacing, n_inner, n_seg=P)
            return lax.fori_loop(0, reps, body, Tp0)[0, 0]
        return run

    t_axis = slope_time(mk_axis, reps=(4, 24))
    print(f"one axis kernel (bidir, n_inner={n_inner}): {t_axis*1e6:9.1f} us "
          f"(x3 = {3*t_axis*1e6:.1f})")

    # --- fused layout transitions alone ---
    def mk_tr(reps):
        def run():
            def body(i, T):
                for axis in range(3):
                    T = ps._repack(T + 0.0, P, axis, (axis + 1) % 3)
                return T
            return lax.fori_loop(0, reps, body, Tp0)[0, 0]
        return run

    t_tr = slope_time(mk_tr, reps=(4, 24))
    print(f"3 fused _repack transitions:          {t_tr*1e6:9.1f} us")

    print(f"\nbreakdown: cycle {t_cycle*1e6:.0f} us ~= 3*kernel "
          f"{3*t_axis*1e6:.0f} + transitions {t_tr*1e6:.0f} "
          f"+ dispatch/rest {max(0.0, (t_cycle - 3*t_axis - t_tr))*1e6:.0f}")
    print(f"solve {t*1e6:.0f} us ~= {int(it)} cycles * {t_cycle*1e6:.0f} us "
          f"+ delta-checks/seed+entry/exit pack = "
          f"{max(0.0, t - int(it)*t_cycle)*1e6:.0f} us")

    # --- roofline ---------------------------------------------------------
    from mceik_tpu.eikonal.pallas_sweep import _plane_update

    plane = Tp0[0]
    ops_per_elem = count_elementwise_ops(
        lambda Tpl, pr, nx, sp_, fl: _plane_update(
            Tpl, pr, nx, sp_, fl, spacing[0], tuple(spacing[1:]), n_inner, P),
        plane, plane, plane, s_packed[0][0], floor_packed[0][0])
    n0, n1, W = Tp0.shape
    elems = n1 * W                       # per plane update
    updates_per_axis = 2 * n0 * elems * n_inner   # bidirectional march
    upd_rate = updates_per_axis / n_inner / t_axis  # plane-element updates/s
    op_rate = (updates_per_axis / n_inner) * ops_per_elem / t_axis
    # Reference: single-issue 8x128-lane VPU at ~0.94 GHz (v5e class);
    # multi-ALU issue would raise the peak — treat as a conservative floor.
    vpu_ref = 8 * 128 * 0.94e9
    print(f"\nroofline: {ops_per_elem} vector ops per element-update "
          f"(from jaxpr of one plane update, n_inner={n_inner} folded)")
    print(f"  element-updates/s: {upd_rate/1e9:.2f} G (incl. n_inner: "
          f"{upd_rate*n_inner/1e9:.2f} G micro-updates/s)")
    print(f"  effective vector op rate: {op_rate/1e12:.3f} Tops/s "
          f"= {100*op_rate/vpu_ref:.0f}% of a single-issue 8x128 @ 0.94 GHz "
          f"VPU ({vpu_ref/1e12:.2f} Tops/s)")
    hbm = 4 * 4 * n0 * n1 * W / t_axis   # 3 in + 1 out whole fields per sweep
    print(f"  HBM traffic bound (4 whole fields / axis sweep): "
          f"{hbm/1e9:.1f} GB/s vs ~800 GB/s v5e HBM -> "
          f"{100*hbm/800e9:.1f}% (VMEM-resident: memory is NOT the binding "
          f"constraint; the kernel is VPU-bound)")


if __name__ == "__main__":
    main()
