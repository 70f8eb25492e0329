"""Streaming lane-batched Pallas kernel parity (interpret mode on CPU):
must match the reference XLA sweep solver, including through the
custom_vmap merge rule (SURVEY.md §4 "Unit: eikonal" + §5 race-analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mceik_tpu.grid import Grid
from mceik_tpu.eikonal import EikonalConfig, solve_eikonal
from mceik_tpu.eikonal.batched import solve_eikonal_batched

CFG = EikonalConfig(method="sweep", tol=1e-6, max_iters=100, use_pallas="off")


def _smooth(key, grid, amp=0.3):
    u = jax.random.normal(key, (5,) * grid.ndim)
    u = jax.image.resize(u, grid.shape, method="linear")
    return jnp.exp(amp * u)


@pytest.mark.parametrize("shape", [(21, 17), (13, 15, 11)])
def test_streamed_matches_reference(shape):
    grid = Grid(shape=shape, spacing=tuple(1.0 for _ in shape))
    s = _smooth(jax.random.PRNGKey(1), grid)
    srcs = jnp.asarray(
        np.random.RandomState(0).uniform(2, min(shape) - 3, (3, len(shape))),
        jnp.float32)
    T_ref = jax.vmap(lambda x: solve_eikonal(s, x, grid, CFG))(srcs)
    T_str = solve_eikonal_batched(s, srcs, grid, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(T_str), np.asarray(T_ref), atol=2e-3)


def test_streamed_vmap_merge():
    """Outer vmap (e.g. chains with per-chain slowness) must merge into the
    lane batch and still agree with the reference."""
    grid = Grid(shape=(13, 11), spacing=(1.0, 1.0))
    key = jax.random.PRNGKey(2)
    s_chains = jnp.stack([_smooth(k, grid) for k in jax.random.split(key, 3)])
    srcs = jnp.asarray([[2.0, 2.0], [9.0, 8.0]], jnp.float32)

    f = lambda s: solve_eikonal_batched(s, srcs, grid, CFG, interpret=True)
    T = jax.vmap(f)(s_chains)  # (3, 2, 13, 11)
    assert T.shape == (3, 2, 13, 11)

    for c in range(3):
        T_ref = jax.vmap(lambda x: solve_eikonal(s_chains[c], x, grid, CFG))(srcs)
        np.testing.assert_allclose(np.asarray(T[c]), np.asarray(T_ref),
                                   atol=2e-3)


def test_tables_route_streaming():
    from mceik_tpu.forward.predict import traveltime_tables

    grid = Grid(shape=(15, 13), spacing=(1.0, 1.0))
    s = _smooth(jax.random.PRNGKey(3), grid)
    pts = jnp.asarray([[2.0, 2.0], [11.0, 9.0], [7.0, 5.0]], jnp.float32)
    cfg_stream = EikonalConfig(method="sweep", tol=1e-6, max_iters=100,
                               use_pallas="interpret")
    T_a = traveltime_tables(s, pts, grid, cfg_stream)
    T_b = traveltime_tables(s, pts, grid, CFG)
    np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=2e-3)
