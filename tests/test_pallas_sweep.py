"""Pallas sweep kernel parity tests (SURVEY.md §4 "Unit: eikonal" +
§5 race-detection analog: the parallel kernel's fixed point must equal the
reference solver's fixed point on random fields).

Runs in interpreter mode on CPU; the same kernel compiles via Mosaic on
TPU (exercised by bench/driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mceik_tpu.grid import Grid
from mceik_tpu.eikonal import EikonalConfig, solve_eikonal


def _smooth_random_slowness(key, grid, coarse=6, amp=0.3):
    u = jax.random.normal(key, (coarse,) * grid.ndim)
    u = jax.image.resize(u, grid.shape, method="linear")
    return jnp.exp(amp * u)


@pytest.mark.parametrize("shape", [(25, 33), (17, 19, 21)])
def test_pallas_matches_reference(shape):
    grid = Grid(shape=shape, spacing=tuple(1.0 for _ in shape))
    s = _smooth_random_slowness(jax.random.PRNGKey(3), grid)
    src = jnp.asarray([3.0] * len(shape), jnp.float32)
    ref_cfg = EikonalConfig(method="sweep", tol=1e-6, max_iters=100,
                            use_pallas="off")
    pl_cfg = EikonalConfig(method="sweep", tol=1e-6, max_iters=100,
                           use_pallas="interpret")
    T_ref = np.asarray(solve_eikonal(s, src, grid, ref_cfg))
    T_pl = np.asarray(solve_eikonal(s, src, grid, pl_cfg))
    np.testing.assert_allclose(T_pl, T_ref, atol=1e-3)


def test_pallas_homogeneous_3d():
    grid = Grid(shape=(17, 17, 17), spacing=(1.0, 1.0, 1.0))
    s = jnp.ones(grid.shape)
    src = jnp.asarray([8.0, 8.0, 8.0], jnp.float32)
    cfg = EikonalConfig(method="sweep", tol=1e-5, max_iters=100,
                        use_pallas="interpret")
    T = np.asarray(solve_eikonal(s, src, grid, cfg))
    xyz = grid.node_coords()
    r = np.sqrt(np.sum((xyz - 8.0) ** 2, axis=-1))
    # First-order upwind corner error on a 17^3 grid is ~0.87 (identical to
    # the reference solver's — parity test above is the strict check).
    assert np.abs(T - r).max() < 1.0


def test_pallas_vmap_over_sources():
    grid = Grid(shape=(17, 21), spacing=(1.0, 1.0))
    s = jnp.ones(grid.shape)
    srcs = jnp.asarray([[2.0, 2.0], [14.0, 18.0]], jnp.float32)
    cfg = EikonalConfig(method="sweep", tol=1e-5, max_iters=100,
                        use_pallas="interpret")
    T = jax.vmap(lambda x: solve_eikonal(s, x, grid, cfg))(srcs)
    assert T.shape == (2, 17, 21)
    xyz = grid.node_coords()
    for i in range(2):
        r = np.sqrt(np.sum((xyz - np.asarray(srcs[i])) ** 2, axis=-1))
        assert np.abs(np.asarray(T[i]) - r).max() < 1.0


def test_blocked_matches_reference():
    """Blocked (big-field) variant: same fixed point as the reference
    solver, with forced multi-block partitioning + halo pinning."""
    from mceik_tpu.eikonal.pallas_sweep import sweep_solve_pallas_blocked
    from mceik_tpu.eikonal.solve import seed_source

    grid = Grid(shape=(16, 13, 11), spacing=(1.0, 1.0, 1.0))
    s = _smooth_random_slowness(jax.random.PRNGKey(7), grid)
    src = jnp.asarray([3.0, 6.0, 5.0], jnp.float32)
    cfg = EikonalConfig(method="sweep", tol=1e-6, max_iters=100,
                        use_pallas="off")
    T_ref = np.asarray(solve_eikonal(s, src, grid, cfg))

    T0, frozen = seed_source(s, src, grid, 3.0)
    T_blk = np.asarray(sweep_solve_pallas_blocked(
        T0, frozen, s, grid.spacing, tol=1e-6, max_cycles=100,
        interpret=True, n_blocks=4))
    np.testing.assert_allclose(T_blk, T_ref, atol=2e-3)


def test_lane_packed_matches_singles():
    """Lane-packed P-field solve == P independent solves (seam masking
    keeps packed fields exactly independent)."""
    from mceik_tpu.eikonal.pallas_sweep import (lane_pack_factor,
                                                sweep_solve_pallas,
                                                sweep_solve_pallas_packed)
    from mceik_tpu.eikonal.solve import seed_source

    grid = Grid(shape=(16, 12, 16), spacing=(1.0, 1.2, 0.9))
    P = lane_pack_factor(grid.shape)
    assert P == 8
    key = jax.random.PRNGKey(3)
    T0s, frs, ss = [], [], []
    for i in range(P):
        s = _smooth_random_slowness(jax.random.fold_in(key, i), grid)
        src = jnp.asarray([2.0 + i, 6.0, 13.0 - i], jnp.float32)
        T0, fr = seed_source(s, src, grid, 3.0)
        T0s.append(T0), frs.append(fr), ss.append(s)
    packed = sweep_solve_pallas_packed(
        jnp.stack(T0s), jnp.stack(frs), jnp.stack(ss), grid.spacing,
        tol=1e-5, max_cycles=60, interpret=True)
    singles = jnp.stack([
        sweep_solve_pallas(T0s[i], frs[i], ss[i], grid.spacing, tol=1e-5,
                           max_cycles=60, interpret=True)
        for i in range(P)])
    np.testing.assert_allclose(np.asarray(packed), np.asarray(singles),
                               atol=1e-4)


def test_lane_packed_via_batched_route():
    """The production impl="field" route lane-packs transparently,
    including a non-multiple-of-P batch (padding)."""
    from mceik_tpu.eikonal.batched import solve_eikonal_batched

    grid = Grid(shape=(16, 12, 16), spacing=(1.0, 1.0, 1.0))
    s = _smooth_random_slowness(jax.random.PRNGKey(5), grid)
    srcs = jnp.asarray([[2.0, 3.0, 4.0], [13.0, 9.0, 2.0], [8.0, 6.0, 8.0]],
                       jnp.float32)  # B=3, P=8 -> padded batch
    cfg = EikonalConfig(method="sweep", tol=1e-5, max_iters=60)
    T = solve_eikonal_batched(s, srcs, grid, cfg, impl="field",
                              interpret=True)
    T_ref = solve_eikonal_batched(s, srcs, grid, cfg, impl="xla")
    assert T.shape == (3,) + grid.shape
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_ref), atol=1e-4)


def test_lane_pack_cliff_warns_and_still_correct():
    """Non-divisor last dims (48, 100, ...) cannot lane-pack: the factor
    falls to 1 LOUDLY (VERDICT r4 weak #5 — previously a silent ~2x
    throughput cliff) and the unpacked path stays correct."""
    import warnings

    from mceik_tpu.eikonal.batched import solve_eikonal_batched
    from mceik_tpu.eikonal.pallas_sweep import lane_pack_factor

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert lane_pack_factor((12, 12, 12)) == 1  # 128 % 12 != 0
        assert any("lane" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert lane_pack_factor((16, 12, 16)) == 8   # divisor: no warning
        assert lane_pack_factor((16, 16, 128)) == 1  # full width: no warning
        assert not w
    # The P=1 route is correct, just register-wasteful.
    grid = Grid(shape=(12, 10, 12), spacing=(1.0, 1.0, 1.0))
    s = _smooth_random_slowness(jax.random.PRNGKey(9), grid)
    srcs = jnp.asarray([[2.0, 3.0, 4.0]], jnp.float32)
    cfg = EikonalConfig(method="sweep", tol=1e-5, max_iters=60)
    T = solve_eikonal_batched(s, srcs, grid, cfg, impl="field",
                              interpret=True)
    T_ref = solve_eikonal_batched(s, srcs, grid, cfg, impl="xla")
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_ref), atol=1e-4)


def test_gridbatch_multiblock_heterogeneous_convergence():
    """Multi-block gridbatch parity with heterogeneous per-block
    convergence (VERDICT r3 weak #2): block 0 holds easy homogeneous
    fields that converge in a few cycles, block 1 holds high-contrast
    fields that need many more — so block 0 rides most cycles through the
    per-block done-skip path (pallas_sweep.sweep_axis0_gridbatch's scal
    column-4 flag). The fixed point must still match the XLA reference
    per field."""
    from mceik_tpu.eikonal.batched import solve_eikonal_batched
    from mceik_tpu.eikonal.pallas_sweep import lane_pack_factor

    grid = Grid(shape=(16, 12, 16), spacing=(1.0, 1.0, 1.0))
    P = lane_pack_factor(grid.shape)
    assert P == 8
    B = 2 * P  # two packed blocks
    key = jax.random.PRNGKey(11)
    s_hard = jnp.stack([
        _smooth_random_slowness(jax.random.fold_in(key, i), grid,
                                coarse=3, amp=0.8) for i in range(P)])
    s_easy = jnp.ones((P,) + grid.shape, jnp.float32)
    s = jnp.concatenate([s_easy, s_hard], axis=0)
    srcs = jnp.stack([
        jnp.asarray([2.0 + (i % 5), 3.0 + (i % 4), 2.0 + i % 7], jnp.float32)
        for i in range(B)])
    cfg = EikonalConfig(method="sweep", tol=1e-5, max_iters=60)
    T = solve_eikonal_batched(s, srcs, grid, cfg, impl="gridbatch",
                              interpret=True)
    T_ref = solve_eikonal_batched(s, srcs, grid, cfg, impl="xla")
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_ref), atol=2e-3)


def test_gridbatch_done_block_passes_through_unswept():
    """Direct unit check of the done-skip contract: a block whose done
    flag is set must stream through the axis sweep UNCHANGED while the
    other block is swept normally."""
    from mceik_tpu.eikonal.pallas_sweep import (_pack, _pack_perms,
                                                lane_pack_factor,
                                                sweep_axis0_gridbatch)
    from mceik_tpu.eikonal.solve import seed_source

    grid = Grid(shape=(16, 12, 16), spacing=(1.0, 1.0, 1.0))
    P = lane_pack_factor(grid.shape)
    key = jax.random.PRNGKey(13)
    T0s, ss, scals = [], [], []
    for b in range(2):
        T0b, sb, scalb = [], [], []
        for i in range(P):
            s = _smooth_random_slowness(
                jax.random.fold_in(key, 10 * b + i), grid)
            src = jnp.asarray([2.0 + i, 5.0, 3.0 + b], jnp.float32)
            T0, _ = seed_source(s, src, grid, 3.0)
            s_src = s[2 + i, 5, 3 + b]
            T0b.append(T0), sb.append(s)
            scalb.append(jnp.asarray(
                [2.0 + i, 5.0, 3.0 + b, s_src], jnp.float32))
        T0s.append(jnp.stack(T0b)), ss.append(jnp.stack(sb))
        scals.append(jnp.stack(scalb))

    _, sperm0, _ = _pack_perms(3, 0)
    Tb = jnp.stack([_pack(T0s[b], sperm0) for b in range(2)])
    sb = jnp.stack([_pack(ss[b], sperm0) for b in range(2)])
    scal = jnp.stack(scals)

    out0 = sweep_axis0_gridbatch(
        Tb, sb, scal, jnp.asarray([0.0, 0.0]), grid.spacing, radius=3.0,
        n_inner=2, interpret=True, n_seg=P)
    out1 = sweep_axis0_gridbatch(
        Tb, sb, scal, jnp.asarray([1.0, 0.0]), grid.spacing, radius=3.0,
        n_inner=2, interpret=True, n_seg=P)
    # done block: exact pass-through of the input field
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(Tb[0]))
    # not-done block: swept identically to the all-active call
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out0[1]))
    # and the sweep genuinely changed the active block (guard against a
    # vacuous pass where nothing sweeps at all)
    assert float(jnp.max(jnp.abs(out0[0] - Tb[0]))) > 1e-3


def test_fused01_cycle_cubic_matches_singles():
    """Cubic grids route the packed cycle through the FUSED axis-0+1
    kernel (sweep_axes01_fused, 2 pallas_calls/cycle — BASELINE.md
    2026-08-21); its fixed point must equal P independent single-field
    solves, exactly like the 3-call cycle it replaces."""
    from mceik_tpu.eikonal.pallas_sweep import (lane_pack_factor,
                                                sweep_solve_pallas,
                                                sweep_solve_pallas_packed)
    from mceik_tpu.eikonal.solve import seed_source

    grid = Grid(shape=(16, 16, 16), spacing=(1.0, 1.1, 0.9))
    P = lane_pack_factor(grid.shape)
    assert P == 8
    key = jax.random.PRNGKey(17)
    T0s, frs, ss = [], [], []
    for i in range(P):
        s = _smooth_random_slowness(jax.random.fold_in(key, i), grid)
        src = jnp.asarray([2.0 + i, 7.0, 13.0 - i], jnp.float32)
        T0, fr = seed_source(s, src, grid, 3.0)
        T0s.append(T0), frs.append(fr), ss.append(s)
    packed = sweep_solve_pallas_packed(
        jnp.stack(T0s), jnp.stack(frs), jnp.stack(ss), grid.spacing,
        tol=1e-5, max_cycles=60, interpret=True)
    singles = jnp.stack([
        sweep_solve_pallas(T0s[i], frs[i], ss[i], grid.spacing, tol=1e-5,
                           max_cycles=60, interpret=True)
        for i in range(P)])
    np.testing.assert_allclose(np.asarray(packed), np.asarray(singles),
                               atol=1e-4)


def test_fused01_cycle_noncubic_nz_matches_singles():
    """The fused axis-0+1 path requires only n_x == n_y (not a cube):
    a (16, 16, 32) grid routes through it too (ADVICE r4). Parity vs P
    independent single-field solves."""
    from mceik_tpu.eikonal.pallas_sweep import (lane_pack_factor,
                                                sweep_solve_pallas,
                                                sweep_solve_pallas_packed)
    from mceik_tpu.eikonal.solve import seed_source

    grid = Grid(shape=(16, 16, 32), spacing=(1.0, 1.1, 0.9))
    P = lane_pack_factor(grid.shape)
    assert P == 4
    key = jax.random.PRNGKey(23)
    T0s, frs, ss = [], [], []
    for i in range(P):
        s = _smooth_random_slowness(jax.random.fold_in(key, i), grid)
        src = jnp.asarray([2.0 + i, 7.0, 21.0 - i], jnp.float32)
        T0, fr = seed_source(s, src, grid, 3.0)
        T0s.append(T0), frs.append(fr), ss.append(s)
    packed = sweep_solve_pallas_packed(
        jnp.stack(T0s), jnp.stack(frs), jnp.stack(ss), grid.spacing,
        tol=1e-5, max_cycles=80, interpret=True)
    singles = jnp.stack([
        sweep_solve_pallas(T0s[i], frs[i], ss[i], grid.spacing, tol=1e-5,
                           max_cycles=80, interpret=True)
        for i in range(P)])
    np.testing.assert_allclose(np.asarray(packed), np.asarray(singles),
                               atol=1e-4)


def test_fused01_vmem_gate():
    """The fused branch keeps 6 packed operands resident; near-VMEM-limit
    square-x/y shapes must fall back to the 3-call cycle (ADVICE r4
    medium). 64^3 packed (P=2 -> (64,64,128), 12 MB resident) fits; an
    (88,88,64) grid packs to (88,88,128) (~24 MB resident) and must not."""
    from mceik_tpu.eikonal.pallas_sweep import _fused01_fits_vmem

    assert _fused01_fits_vmem((64, 64, 128))
    assert _fused01_fits_vmem((16, 16, 128))
    assert not _fused01_fits_vmem((88, 88, 128))
    assert not _fused01_fits_vmem((128, 128, 128))


def test_fused012_cycle_matches_fused01_bitexact():
    """Cube grids with source coords provided route the packed cycle
    through the FULLY fused kernel (sweep_axes012_fused: all three axis
    sweeps + the in-kernel lane-crossing relayout + in-kernel floor
    reconstruction in ONE pallas_call). Its fixed point must be BIT-EXACT
    vs the fused01 2-call cycle (the floor-reconstruction argument in the
    fused012 section comment is exactness, not approximation)."""
    from mceik_tpu.eikonal.pallas_sweep import (lane_pack_factor,
                                                sweep_solve_pallas,
                                                sweep_solve_pallas_packed)
    from mceik_tpu.eikonal.solve import seed_source

    grid = Grid(shape=(16, 16, 16), spacing=(1.0, 1.1, 0.9))
    P = lane_pack_factor(grid.shape)
    key = jax.random.PRNGKey(29)
    T0s, frs, ss, sis = [], [], [], []
    for i in range(P):
        s = _smooth_random_slowness(jax.random.fold_in(key, i), grid)
        src = jnp.asarray([2.0 + i, 7.0, 13.0 - i], jnp.float32)
        T0, fr = seed_source(s, src, grid, 3.0)
        T0s.append(T0), frs.append(fr), ss.append(s)
        sis.append(grid.to_index_coords(src))
    T0b, frb, sb = jnp.stack(T0s), jnp.stack(frs), jnp.stack(ss)
    si = jnp.stack(sis)

    fused012 = sweep_solve_pallas_packed(
        T0b, frb, sb, grid.spacing, tol=1e-5, max_cycles=60, interpret=True,
        src_idx=si, seed_radius=3.0)
    fused01 = sweep_solve_pallas_packed(
        T0b, frb, sb, grid.spacing, tol=1e-5, max_cycles=60, interpret=True)
    np.testing.assert_array_equal(np.asarray(fused012), np.asarray(fused01))

    singles = jnp.stack([
        sweep_solve_pallas(T0s[i], frs[i], ss[i], grid.spacing, tol=1e-5,
                           max_cycles=60, interpret=True)
        for i in range(P)])
    np.testing.assert_allclose(np.asarray(fused012), np.asarray(singles),
                               atol=1e-4)
