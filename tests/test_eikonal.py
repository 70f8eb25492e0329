"""Eikonal solver unit tests (SURVEY.md §4 rows "Unit: eikonal" and
"Unit: solver invariances"): analytic solutions, solver cross-agreement,
causality/monotonicity, grid-refinement convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mceik_tpu.grid import Grid
from mceik_tpu.eikonal import EikonalConfig, solve_eikonal
from mceik_tpu.eikonal.godunov import BIG


def _radial(grid, src):
    xyz = grid.node_coords()
    return np.sqrt(np.sum((xyz - np.asarray(src)) ** 2, axis=-1))


@pytest.mark.parametrize("method", ["jacobi", "sweep"])
def test_homogeneous_2d(method):
    grid = Grid(shape=(65, 65), spacing=(1.0, 1.0))
    s = jnp.ones(grid.shape)
    src = jnp.array([32.0, 32.0])
    cfg = EikonalConfig(method=method, tol=1e-5, max_iters=500)
    T = np.asarray(solve_eikonal(s, src, grid, cfg))
    r = _radial(grid, [32.0, 32.0])
    # First-order upwind error grows along diagonals; bound abs error on the
    # full grid and require near-exactness at moderate radii.
    err = np.abs(T - r)
    assert err.max() < 1.5, f"max abs err {err.max()}"
    near = r < 20
    assert err[near].max() < 0.7, f"near-field err {err[near].max()}"
    # Causality: computed first-arrival can never beat the straight ray.
    assert (T >= r - 1e-3).all()


@pytest.mark.parametrize("method", ["jacobi", "sweep"])
def test_homogeneous_3d(method):
    grid = Grid(shape=(33, 33, 33), spacing=(1.0, 1.0, 1.0))
    s = jnp.full(grid.shape, 0.5)
    src = jnp.array([16.0, 16.0, 16.0])
    cfg = EikonalConfig(method=method, tol=1e-5, max_iters=500)
    T = np.asarray(solve_eikonal(s, src, grid, cfg))
    r = _radial(grid, [16.0, 16.0, 16.0])
    err = np.abs(T - 0.5 * r)
    assert err.max() < 0.8, f"max abs err {err.max()}"
    assert (T >= 0.5 * r - 1e-3).all()


def test_anisotropic_spacing():
    grid = Grid(shape=(49, 25), spacing=(0.5, 1.0))
    s = jnp.ones(grid.shape)
    src = jnp.array([12.0, 12.0])  # physical coords
    T = np.asarray(solve_eikonal(s, src, grid))
    xyz = grid.node_coords()
    r = np.sqrt(np.sum((xyz - np.array([12.0, 12.0])) ** 2, axis=-1))
    assert np.abs(T - r).max() < 1.0


def test_sweep_matches_jacobi_random_field():
    key = jax.random.PRNGKey(0)
    grid = Grid(shape=(33, 33), spacing=(1.0, 1.0))
    # Smooth random positive slowness field.
    u = jax.random.normal(key, (8, 8))
    u = jax.image.resize(u, grid.shape, method="cubic")
    s = jnp.exp(0.3 * u)
    src = jnp.array([5.0, 27.0])
    cfg_j = EikonalConfig(method="jacobi", tol=1e-6, max_iters=2000)
    cfg_s = EikonalConfig(method="sweep", tol=1e-6, max_iters=100)
    Tj = np.asarray(solve_eikonal(s, src, grid, cfg_j))
    Ts = np.asarray(solve_eikonal(s, src, grid, cfg_s))
    assert (Tj < BIG / 2).all() and (Ts < BIG / 2).all()
    np.testing.assert_allclose(Ts, Tj, atol=5e-4)


def test_off_node_source():
    grid = Grid(shape=(33, 33), spacing=(1.0, 1.0))
    s = jnp.ones(grid.shape)
    src = jnp.array([16.3, 15.7])
    T = np.asarray(solve_eikonal(s, src, grid))
    r = _radial(grid, [16.3, 15.7])
    assert np.abs(T - r).max() < 1.0


def test_grid_refinement_convergence():
    """Halving h should shrink the error (first-order scheme)."""
    errs = []
    for n in (33, 65, 129):
        grid = Grid(shape=(n, n), spacing=(32.0 / (n - 1),) * 2)
        s = jnp.ones(grid.shape)
        src = jnp.array([16.0, 16.0])
        T = np.asarray(solve_eikonal(s, src, grid, EikonalConfig(tol=1e-6)))
        r = _radial(grid, [16.0, 16.0])
        mask = r > 2.0  # exclude the seeded singular core
        errs.append(np.abs(T - r)[mask].mean())
    assert errs[2] < errs[1] < errs[0]


def test_vmap_over_sources():
    grid = Grid(shape=(33, 33), spacing=(1.0, 1.0))
    s = jnp.ones(grid.shape)
    srcs = jnp.array([[4.0, 4.0], [28.0, 4.0], [16.0, 28.0]])
    T = jax.vmap(lambda x: solve_eikonal(s, x, grid))(srcs)
    assert T.shape == (3, 33, 33)
    for i in range(3):
        r = _radial(grid, np.asarray(srcs[i]))
        assert np.abs(np.asarray(T[i]) - r).max() < 1.5
