"""On-device sanity + honest timing of every batched eikonal path.

Run on the real TPU (not in CI — CI is CPU-only):
    python tools/tpu_sanity.py

Validates each path's 64-solve batch against a tight small-batch reference
(guards the backend's batch>=32 sweep miscompilation regression) and times
with dependency-chained inputs so neither XLA nor the runtime can reuse or
overlap identical computations.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mceik_tpu.grid import Grid
from mceik_tpu.eikonal import EikonalConfig, solve_eikonal
from mceik_tpu.eikonal.batched import solve_eikonal_batched


def main():
    print("devices:", jax.devices())
    grid = Grid(shape=(64, 64, 64), spacing=(1.0, 1.0, 1.0))
    u = jax.image.resize(jax.random.normal(jax.random.PRNGKey(0), (6, 6, 6)),
                         grid.shape, "linear")
    s = jnp.exp(0.2 * u)
    srcs = jnp.asarray(np.random.RandomState(0).uniform(5, 59, (8, 3)),
                       jnp.float32)
    s8 = jnp.stack([s] * 8)

    cfgR = EikonalConfig(method="sweep", tol=1e-5, max_iters=60,
                         use_pallas="off")
    # Tight reference in safe-batch chunks of 8.
    TR = jax.vmap(lambda x: solve_eikonal(s, x, grid, cfgR))(srcs)
    jax.block_until_ready(TR)

    def run_case(label, f):
        T = f(s8)
        jax.block_until_ready(T)
        err = float(jnp.max(jnp.abs(T[0] - TR)))
        # Dependency-chained timing: each call's input depends on the
        # previous call's output.
        n = 3
        acc = s8
        t0 = time.perf_counter()
        for _ in range(n):
            T = f(acc)
            acc = s8 * (1.0 + 1e-7 * T.mean())
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / n
        status = "OK " if err < 5e-2 else "BAD"
        print(f"{status} {label:24s} {dt*1000:9.1f} ms/batch  err={err:.2e}")
        return err

    cfg = EikonalConfig(method="sweep", tol=1e-3, max_iters=40)
    cfgJ = EikonalConfig(method="jacobi", tol=1e-3, max_iters=400)

    cfgP = EikonalConfig(method="sweep", tol=1e-3, max_iters=40,
                         use_pallas="on")
    cases = [
        ("xla-sweep-chunked", jax.jit(jax.vmap(
            lambda ss: solve_eikonal_batched(ss, srcs, grid, cfg, impl="xla")))),
        ("pallas-field", jax.jit(jax.vmap(jax.vmap(
            lambda ss, x: solve_eikonal(ss, x, grid, cfgP), (None, 0)),
            (0, None)))),
        # (a "pallas-stream" row existed through r3 but silently fell
        # through to the XLA path: the stream kernel was deleted
        # 2026-08-19 and batched.py has no such impl branch — removed)
        ("pallas-gridbatch", jax.jit(jax.vmap(
            lambda ss: solve_eikonal_batched(ss, srcs, grid, cfg,
                                             impl="gridbatch")))),
        ("xla-jacobi", jax.jit(jax.vmap(
            lambda ss: solve_eikonal_batched(ss, srcs, grid, cfgJ,
                                             impl="xla")))),
    ]
    for label, f in cases:
        if label == "pallas-field":
            run_case(label, lambda ss, g=f: g(ss, srcs))
        else:
            run_case(label, f)


if __name__ == "__main__":
    main()
