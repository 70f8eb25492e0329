"""Synthetic truth models, acquisition geometries, and noisy arrivals.

Validation follows the reference's posture (SURVEY.md §0 item 5): smooth
checkerboard velocity anomalies + crosswell / surface-array geometries;
posterior recovery of the checkerboard is the correctness criterion.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mceik_tpu.config import DataCfg, ModelCfg
from mceik_tpu.eikonal.solve import EikonalConfig
from mceik_tpu.forward.predict import predict_events, predict_tomo, traveltime_tables
from mceik_tpu.grid import Grid
from mceik_tpu.model.data import EventData, TomoData


def checkerboard_slowness(
    grid: Grid,
    cells: Tuple[int, ...],
    amplitude: float,
    background: float = 1.0,
) -> jnp.ndarray:
    """Smooth sinusoidal checkerboard: s = s_bg * exp(A * prod_d sin(pi k_d x_d / L_d)).

    The smooth (sine) variant is standard in tomography resolution tests and
    is representable by the coarse inversion basis, so posterior-mean
    recovery is a meaningful correctness check.
    """
    axes = grid.axes()
    ext = grid.extent
    pattern = jnp.ones(grid.shape, dtype=jnp.float32)
    for d in range(grid.ndim):
        x = jnp.asarray((axes[d] - grid.origin[d]) / max(ext[d], 1e-12))
        sd = jnp.sin(jnp.pi * cells[d] * x).astype(jnp.float32)
        shape = [1] * grid.ndim
        shape[d] = grid.shape[d]
        pattern = pattern * sd.reshape(shape)
    return background * jnp.exp(amplitude * pattern)


def crosswell_geometry(grid: Grid, n_src: int, n_rec: int, margin_frac: float = 0.08):
    """2-D crosswell: sources down one well, receivers down the other."""
    assert grid.ndim == 2
    (x0, y0), (ex, ey) = grid.origin, grid.extent
    m = margin_frac
    src = np.stack(
        [np.full(n_src, x0 + m * ex),
         y0 + ey * np.linspace(m, 1 - m, n_src)], axis=-1)
    rec = np.stack(
        [np.full(n_rec, x0 + (1 - m) * ex),
         y0 + ey * np.linspace(m, 1 - m, n_rec)], axis=-1)
    return jnp.asarray(src, jnp.float32), jnp.asarray(rec, jnp.float32)


def surface_array_geometry(grid: Grid, n_sta: int, seed: int = 0):
    """3-D: stations scattered on the free surface (min z plane)."""
    assert grid.ndim == 3
    rng = np.random.default_rng(seed)
    lo = np.asarray(grid.origin)
    ext = np.asarray(grid.extent)
    xy = lo[:2] + ext[:2] * (0.05 + 0.9 * rng.random((n_sta, 2)))
    z = np.full((n_sta, 1), lo[2])
    return jnp.asarray(np.concatenate([xy, z], axis=-1), jnp.float32)


def borehole_3d_geometry(grid: Grid, n_src: int, n_rec: int):
    """3-D crosswell-like: sources on one face, receivers on opposite face,
    laid out on a coarse face grid (for the checkerboard-3d tomography
    config where sources are known)."""
    assert grid.ndim == 3
    lo = np.asarray(grid.origin)
    ext = np.asarray(grid.extent)

    def face_points(n, xfrac):
        k = int(np.ceil(np.sqrt(n)))
        ys = lo[1] + ext[1] * np.linspace(0.1, 0.9, k)
        zs = lo[2] + ext[2] * np.linspace(0.1, 0.9, k)
        Y, Z = np.meshgrid(ys, zs, indexing="ij")
        pts = np.stack([np.full(k * k, lo[0] + xfrac * ext[0]),
                        Y.ravel(), Z.ravel()], axis=-1)
        return pts[:n]

    return (jnp.asarray(face_points(n_src, 0.05), jnp.float32),
            jnp.asarray(face_points(n_rec, 0.95), jnp.float32))


def crosswell_dataset(grid: Grid, dcfg: DataCfg, mcfg: ModelCfg,
                      eik: EikonalConfig = EikonalConfig()):
    """Config 1: 2-D crosswell arrivals through a checkerboard truth."""
    s_true = checkerboard_slowness(grid, dcfg.checker_cells,
                                   dcfg.checker_amplitude,
                                   mcfg.background_slowness)
    src, rec = crosswell_geometry(grid, dcfg.n_src, dcfg.n_rec)
    t_clean = predict_tomo(s_true, src, rec, grid, eik)
    key = jax.random.PRNGKey(dcfg.seed)
    t_obs = t_clean + dcfg.noise * jax.random.normal(key, t_clean.shape)
    return TomoData(src_xyz=src, rec_xyz=rec, t_obs=t_obs), s_true


def checkerboard3d_dataset(grid: Grid, dcfg: DataCfg, mcfg: ModelCfg,
                           eik: EikonalConfig = EikonalConfig()):
    """Config 2: 3-D checkerboard, borehole-face acquisition, known sources."""
    s_true = checkerboard_slowness(grid, dcfg.checker_cells,
                                   dcfg.checker_amplitude,
                                   mcfg.background_slowness)
    src, rec = borehole_3d_geometry(grid, dcfg.n_src, dcfg.n_rec)
    t_clean = predict_tomo(s_true, src, rec, grid, eik)
    key = jax.random.PRNGKey(dcfg.seed)
    t_obs = t_clean + dcfg.noise * jax.random.normal(key, t_clean.shape)
    return TomoData(src_xyz=src, rec_xyz=rec, t_obs=t_obs), s_true


def volume3d_geometry(grid: Grid, n_src: int, n_rec: int, seed: int = 0):
    """3-D full-coverage acquisition: known sources scattered through the
    volume interior (borehole shots at several depths/wells), receivers on
    the free surface plus two opposite side faces.

    Rationale: the borehole face-to-face geometry
    (borehole_3d_geometry) sends every ray roughly along +x, so structure
    stacked ALONG x is integrated over identically and cannot be recovered
    (measured: posterior mean/truth correlation ~0.2 on a 2x2x2
    checkerboard no matter the noise level). Crossing ray coverage is what
    makes 3-D checkerboard recovery a meaningful integration criterion."""
    assert grid.ndim == 3
    rng = np.random.default_rng(seed)
    lo = np.asarray(grid.origin)
    ext = np.asarray(grid.extent)
    src = lo + ext * (0.15 + 0.7 * rng.random((n_src, 3)))

    recs = []
    for i in range(n_rec):
        face = i % 3
        p = lo + ext * (0.1 + 0.8 * rng.random(3))
        if face == 0:
            p[2] = lo[2]                         # free surface
        elif face == 1:
            p[0] = lo[0] + 0.97 * ext[0]         # +x face
        else:
            p[1] = lo[1] + 0.97 * ext[1]         # +y face
        recs.append(p)
    return (jnp.asarray(src, jnp.float32),
            jnp.asarray(np.stack(recs), jnp.float32))


def checkerboard3d_volume_dataset(grid: Grid, dcfg: DataCfg, mcfg: ModelCfg,
                                  eik: EikonalConfig = EikonalConfig()):
    """3-D checkerboard with volume acquisition (recovery-capable)."""
    s_true = checkerboard_slowness(grid, dcfg.checker_cells,
                                   dcfg.checker_amplitude,
                                   mcfg.background_slowness)
    src, rec = volume3d_geometry(grid, dcfg.n_src, dcfg.n_rec, dcfg.seed)
    t_clean = predict_tomo(s_true, src, rec, grid, eik)
    key = jax.random.PRNGKey(dcfg.seed)
    t_obs = t_clean + dcfg.noise * jax.random.normal(key, t_clean.shape)
    return TomoData(src_xyz=src, rec_xyz=rec, t_obs=t_obs), s_true


def events_dataset(grid: Grid, dcfg: DataCfg, mcfg: ModelCfg,
                   eik: EikonalConfig = EikonalConfig()):
    """Config 3/5: surface stations + interior earthquakes, checkerboard
    truth; returns (EventData, s_true, hypo_true, t0_true)."""
    s_true = checkerboard_slowness(grid, dcfg.checker_cells,
                                   dcfg.checker_amplitude,
                                   mcfg.background_slowness)
    sta = surface_array_geometry(grid, dcfg.n_stations, seed=dcfg.seed)
    rng = np.random.default_rng(dcfg.seed + 1)
    lo = np.asarray(grid.origin)
    ext = np.asarray(grid.extent)
    hypo = jnp.asarray(lo + ext * (0.15 + 0.7 * rng.random((dcfg.n_events, grid.ndim))),
                       jnp.float32)
    t0 = jnp.asarray(0.2 * rng.standard_normal(dcfg.n_events), jnp.float32)
    tables = traveltime_tables(s_true, sta, grid, eik)
    t_clean = predict_events(tables, hypo, t0, grid)
    key = jax.random.PRNGKey(dcfg.seed + 2)
    t_obs = t_clean + dcfg.noise * jax.random.normal(key, t_clean.shape)
    return EventData(sta_xyz=sta, t_obs=t_obs), s_true, hypo, t0


def events_volume_dataset(grid: Grid, dcfg: DataCfg, mcfg: ModelCfg,
                          eik: EikonalConfig = EikonalConfig()):
    """Joint problem (config-3-shaped) with VOLUME acquisition: stations on
    the free surface PLUS two side faces (volume3d_geometry's receiver
    distribution) observing interior earthquakes.

    Rationale (same as checkerboard3d_volume vs the face-to-face
    geometry): the surface-only net of events_dataset leaves the classic
    depth-velocity trade-off ridge — with t0 marginalized, event depth and
    slowness along the path are near-exchangeable, and the joint posterior
    acquires directions with autocorrelation times in the thousands for
    ANY fixed-preconditioner local kernel (measured 2026-08-21: GN-MALA at
    eps 0.21/accept 0.47 still had per-cell ESS at the n_chains/2 floor on
    the 27-dim golden problem). Multi-face stations see events from the
    side, closing the ridge — required for the golden z-test harness,
    whose check runs must actually mix within a CI budget."""
    s_true = checkerboard_slowness(grid, dcfg.checker_cells,
                                   dcfg.checker_amplitude,
                                   mcfg.background_slowness)
    _, sta = volume3d_geometry(grid, 1, dcfg.n_stations, dcfg.seed)
    rng = np.random.default_rng(dcfg.seed + 1)
    lo = np.asarray(grid.origin)
    ext = np.asarray(grid.extent)
    hypo = jnp.asarray(
        lo + ext * (0.2 + 0.6 * rng.random((dcfg.n_events, grid.ndim))),
        jnp.float32)
    t0 = jnp.asarray(0.2 * rng.standard_normal(dcfg.n_events), jnp.float32)
    tables = traveltime_tables(s_true, sta, grid, eik)
    t_clean = predict_events(tables, hypo, t0, grid)
    key = jax.random.PRNGKey(dcfg.seed + 2)
    t_obs = t_clean + dcfg.noise * jax.random.normal(key, t_clean.shape)
    return EventData(sta_xyz=sta, t_obs=t_obs), s_true, hypo, t0


def make_dataset(grid: Grid, dcfg: DataCfg, mcfg: ModelCfg,
                 eik: EikonalConfig = EikonalConfig()):
    """Dispatch on DataCfg.dataset; returns (data, truth_dict).

    Synthetic names generate data in-process; "file"/"csv" ingest observed
    station/arrival tables (io/loaders.py) so real-data workflows run
    through the identical posterior/sampler path.
    """
    if dcfg.dataset == "file":
        from mceik_tpu.io.loaders import load_dataset_hdf5
        if not dcfg.path:
            raise ValueError('dataset="file" requires data.path')
        data, truth = load_dataset_hdf5(dcfg.path)
        if "slowness" in truth and tuple(truth["slowness"].shape) != tuple(grid.shape):
            raise ValueError(
                f"{dcfg.path}: stored truth slowness {truth['slowness'].shape}"
                f" != grid {tuple(grid.shape)}")
        return data, truth
    if dcfg.dataset == "csv":
        from mceik_tpu.io.loaders import load_events_csv
        if not (dcfg.stations_path and dcfg.arrivals_path):
            raise ValueError(
                'dataset="csv" requires data.stations_path and '
                'data.arrivals_path')
        return load_events_csv(dcfg.stations_path, dcfg.arrivals_path), {}
    if dcfg.dataset == "crosswell2d":
        data, s_true = crosswell_dataset(grid, dcfg, mcfg, eik)
        return data, {"slowness": s_true}
    if dcfg.dataset == "checkerboard3d":
        data, s_true = checkerboard3d_dataset(grid, dcfg, mcfg, eik)
        return data, {"slowness": s_true}
    if dcfg.dataset == "checkerboard3d_volume":
        data, s_true = checkerboard3d_volume_dataset(grid, dcfg, mcfg, eik)
        return data, {"slowness": s_true}
    if dcfg.dataset == "events3d":
        data, s_true, hypo, t0 = events_dataset(grid, dcfg, mcfg, eik)
        return data, {"slowness": s_true, "hypo": hypo, "t0": t0}
    if dcfg.dataset == "events3d_volume":
        data, s_true, hypo, t0 = events_volume_dataset(grid, dcfg, mcfg, eik)
        return data, {"slowness": s_true, "hypo": hypo, "t0": t0}
    raise ValueError(f"unknown dataset {dcfg.dataset!r}")
