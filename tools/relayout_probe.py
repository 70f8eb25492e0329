"""Probe: can Mosaic compile an IN-KERNEL lane-crossing packed-layout
relayout (packed axis-1 -> axis-2 layout), and what does it cost?

The r4->r5 fusion lever (BASELINE.md 2026-08-21) needs one pallas_call
per sweep cycle; the axis-1 -> axis-2 packed relayout moves the swept
axis out of the 128-wide lane dim (labels [1,0,'P',2] -> [2,0,'P',1],
i.e. a (3,1,2,0) transpose of the (y, x, P, z) view) — lane<->sublane
territory Mosaic may or may not lower. This probe:

1. compiles a kernel that does ONLY that relayout, checks it against
   the XLA `_repack` result bit-for-bit,
2. times it by marginal cost (fori_loop slope) next to the leading-2D
   transpose used by the fused01 kernel (the known-cheap case).

Run on chip: PYTHONPATH=/root/repo:/root/.axon_site python tools/relayout_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mceik_tpu.eikonal.pallas_sweep import _repack


def _relayout12_kernel(x_ref, o_ref, *, P):
    # The direct reshape->4D-transpose spelling fails Mosaic
    # ("infer-vector-layout: unsupported shape cast"); this decomposition
    # compiles: full reversal (2,1,0) (supported), then per-segment
    # major-dim slices re-concatenated along lanes.
    na, nb, W = x_ref.shape
    nc = W // P
    xt = jnp.transpose(x_ref[...], (2, 1, 0))         # (W, nb, na)
    segs = [xt[p * nc:(p + 1) * nc] for p in range(P)]
    o_ref[...] = jnp.concatenate(segs, axis=-1)       # (nc, nb, P*na)


@functools.partial(jax.jit, static_argnames=("P", "interpret"))
def relayout12(x, P, interpret=False):
    na, nb, W = x.shape
    nc = W // P
    return pl.pallas_call(
        functools.partial(_relayout12_kernel, P=P),
        out_shape=jax.ShapeDtypeStruct((nc, nb, P * na), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _leading_t_kernel(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (1, 0, 2))


@jax.jit
def leading_t(x):
    return pl.pallas_call(
        _leading_t_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (x.shape[1], x.shape[0], x.shape[2]), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def slope_time(f, x, k1=20, k2=120):
    """Marginal cost per application via fori_loop slopes (verify
    SKILL.md: host timings through the tunnel are unreliable)."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def rep(x, k):
        def body(i, acc):
            y = f(acc)
            # data dependence without changing layout semantics
            return y * 1.0
        return lax.fori_loop(0, k, body, x)

    def t(k):
        r = rep(x, k)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(rep(x, k))
        return (time.perf_counter() - t0) / 3

    t1, t2 = t(k1), t(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    print("devices:", jax.devices())
    P = 2
    n = 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, n, P * n), jnp.float32)

    # parity vs the XLA _repack (axis 1 -> axis 2)
    want = _repack(x, P, 1, 2)
    try:
        got = relayout12(x, P)
        got.block_until_ready()
    except Exception as e:
        print("COMPILE FAIL (relayout12):", type(e).__name__)
        print(str(e)[:2000])
        return
    err = float(jnp.max(jnp.abs(got - want)))
    exact = bool(jnp.all(got == want))
    print(f"relayout12 parity: max|diff|={err:.3e} bit_exact={exact}")

    # cost: lane-crossing relayout vs leading-2D transpose.
    # relayout12 output shape == input shape for cubes, so fori chaining
    # is shape-stable.
    c_cross = slope_time(lambda y: relayout12(y, P), x)
    c_lead = slope_time(leading_t, x)
    print(f"lane-crossing relayout: {c_cross*1e6:.1f} us/call")
    print(f"leading-2D transpose:   {c_lead*1e6:.1f} us/call")


if __name__ == "__main__":
    main()
