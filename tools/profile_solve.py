"""Marginal-slope breakdown of the packed Pallas eikonal solve on TPU.

Host timings through the tunnel carry ~50 ms fixed overhead (see
docs/ARCHITECTURE.md), so every stage is timed as the SLOPE of wall time
vs repetition count of a dependency-chained `lax.fori_loop` running on
device, with a scalar readback.

Stages measured for the bench-shaped 64^3 packed (P=2) solve:
  - full fixed-point solve (while_loop of cycles)
  - one full cycle (3 axes: pack + kernel + unpack each)
  - one axis kernel (sweep_axis0, packed layout, no transposes)
  - pack+unpack transposes only (no kernel)
  - converged cycle count at bench tol
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
    T0p = jnp.stack([T0] * P)
    frp = jnp.stack([frozen] * P)
    sp = jnp.stack([s] * P)
    spacing = grid.spacing
    tol, max_cycles, n_inner = 1e-3, 40, 4

    seed_floor = jnp.where(frp, T0p, 0.0).astype(jnp.float32)
    s_packed, floor_packed = [], []
    for axis in range(3):
        _, sperm, _ = ps._pack_perms(3, axis)
        s_packed.append(ps._pack(sp, sperm))
        floor_packed.append(ps._pack(seed_floor, sperm))
    s_packed, floor_packed = tuple(s_packed), tuple(floor_packed)

    # --- converged cycle count ---
    def count_cycles():
        def cond(c):
            _, d, it = c
            return jnp.logical_and(d > tol, it < max_cycles)

        def body(c):
            T, _, it = c
            Tn = ps.sweep_cycle_pallas_packed(T, s_packed, floor_packed,
                                              spacing, n_inner)
            return Tn, jnp.max(jnp.abs(Tn - T)), it + 1

        _, d, it = lax.while_loop(cond, body,
                                  (T0p, jnp.asarray(jnp.inf, jnp.float32), 0))
        return d, it

    d, it = jax.jit(count_cycles)()
    print(f"cycles to tol={tol}: {int(it)} (final delta {float(d):.2e})")

    # --- full solve slope ---
    def mk_solve(reps):
        def run():
            def body(i, carry):
                T0x = T0p * (1.0 + 1e-9 * carry)
                T = ps.sweep_solve_pallas_packed(T0x, frp, sp, spacing, tol,
                                                 max_cycles, n_inner)
                return jnp.sum(T[0, 0, 0])
            return lax.fori_loop(0, reps, body, 0.0)
        return run

    t = slope_time(mk_solve)
    print(f"full packed solve ({P} fields): {t*1e6:9.1f} us  "
          f"-> {t*1e6/P:.1f} us/field")

    # --- one cycle slope ---
    def mk_cycle(reps):
        def run():
            def body(i, T):
                return ps.sweep_cycle_pallas_packed(T, s_packed, floor_packed,
                                                    spacing, n_inner)
            return lax.fori_loop(0, reps, body, T0p)[0, 0, 0]
        return run

    t_cycle = slope_time(mk_cycle, reps=(4, 24))
    print(f"one cycle (3 axes, pack+kern+unpack): {t_cycle*1e6:9.1f} us")

    # --- one axis kernel slope (packed layout, fixed layout, no transposes) ---
    Tp0 = ps._pack(T0p, ps._pack_perms(3, 0)[1])

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

    # --- transposes only ---
    def mk_tr(reps):
        def run():
            def body(i, Tst):
                for axis in range(3):
                    perm, sperm, inv_sperm = ps._pack_perms(3, axis)
                    Tp = ps._pack(Tst, sperm)
                    Tst = ps._unpack(Tp + 0.0, P, inv_sperm)
                return Tst
            return lax.fori_loop(0, reps, body, T0p)[0, 0, 0]
        return run

    t_tr = slope_time(mk_tr, reps=(4, 24))
    print(f"pack+unpack transposes x3 axes:       {t_tr*1e6:9.1f} us")

    print(f"\nbreakdown: cycle {t_cycle*1e6:.0f} us ~= 3*kernel "
          f"{3*t_axis*1e6:.0f} + transposes {t_tr*1e6:.0f} "
          f"+ dispatch/rest {max(0.0, (t_cycle - 3*t_axis - t_tr))*1e6:.0f}")
    print(f"solve {t*1e6:.0f} us ~= {int(it)} cycles * {t_cycle*1e6:.0f} us "
          f"+ delta-checks/seed = {max(0.0, t - int(it)*t_cycle)*1e6:.0f} us")


if __name__ == "__main__":
    main()
