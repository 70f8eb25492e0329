"""Grid-sharded (domain-decomposed) solve vs single-device reference on
the 8-virtual-device CPU mesh (SURVEY.md §4 "Distributed (no cluster)",
§2.3 SP/CP analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mceik_tpu.dist.mesh import chain_mesh
from mceik_tpu.eikonal import EikonalConfig, solve_eikonal
from mceik_tpu.eikonal.dist_sweep import solve_eikonal_sharded
from mceik_tpu.grid import Grid


def _smooth(key, grid, amp=0.25):
    u = jax.random.normal(key, (4,) * grid.ndim)
    u = jax.image.resize(u, grid.shape, method="linear")
    return jnp.exp(amp * u)


@pytest.mark.parametrize("shape,src", [
    ((24, 17), [4.0, 8.0]),
    ((16, 11, 9), [3.0, 5.0, 4.0]),
])
def test_sharded_matches_unsharded(shape, src):
    grid = Grid(shape=shape, spacing=tuple(1.0 for _ in shape))
    s = _smooth(jax.random.PRNGKey(8), grid)
    src = jnp.asarray(src, jnp.float32)
    cfg = EikonalConfig(method="sweep", tol=1e-6, max_iters=200,
                        use_pallas="off")
    T_ref = np.asarray(solve_eikonal(s, src, grid, cfg))

    mesh = chain_mesh(n_devices=8, axis="grid")
    T_sh = np.asarray(solve_eikonal_sharded(s, src, grid, mesh, "grid", cfg))
    np.testing.assert_allclose(T_sh, T_ref, atol=2e-3)


def test_sharded_on_two_devices():
    grid = Grid(shape=(20, 13), spacing=(1.0, 1.0))
    s = jnp.ones(grid.shape)
    src = jnp.asarray([9.5, 6.0], jnp.float32)
    cfg = EikonalConfig(method="sweep", tol=1e-6, max_iters=200,
                        use_pallas="off")
    T_ref = np.asarray(solve_eikonal(s, src, grid, cfg))
    mesh = chain_mesh(n_devices=2, axis="grid")
    T_sh = np.asarray(solve_eikonal_sharded(s, src, grid, mesh, "grid", cfg))
    np.testing.assert_allclose(T_sh, T_ref, atol=2e-3)
