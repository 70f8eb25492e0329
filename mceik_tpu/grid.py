"""Regular-grid geometry shared by the solver, forward model and datasets.

The reference stack (SURVEY.md §1 L0/L1) carries grid metadata through
Fortran common blocks / C structs; here it is a small frozen dataclass that
is *static* under ``jax.jit`` (hashable, shapes only — no traced values).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """A regular 2-D or 3-D grid.

    Attributes:
      shape:   number of nodes per axis, e.g. ``(nx, ny)`` or ``(nx, ny, nz)``.
      spacing: node spacing per axis (same length as ``shape``), in physical
               units (km).
      origin:  physical coordinate of node ``(0, ..., 0)``.
    """

    shape: Tuple[int, ...]
    spacing: Tuple[float, ...]
    origin: Tuple[float, ...] = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.origin is None:
            object.__setattr__(self, "origin", (0.0,) * len(self.shape))
        if not (len(self.shape) == len(self.spacing) == len(self.origin)):
            raise ValueError(
                f"rank mismatch: shape={self.shape} spacing={self.spacing} "
                f"origin={self.origin}"
            )
        object.__setattr__(self, "shape", tuple(int(n) for n in self.shape))
        object.__setattr__(self, "spacing", tuple(float(h) for h in self.spacing))
        object.__setattr__(self, "origin", tuple(float(o) for o in self.origin))

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def n_nodes(self) -> int:
        return int(np.prod(self.shape))

    @property
    def extent(self) -> Tuple[float, ...]:
        """Physical size per axis (distance from first to last node)."""
        return tuple((n - 1) * h for n, h in zip(self.shape, self.spacing))

    def axes(self):
        """Per-axis physical coordinate vectors (numpy, host-side)."""
        return tuple(
            np.asarray(o + h * np.arange(n))
            for n, h, o in zip(self.shape, self.spacing, self.origin)
        )

    def to_index_coords(self, xyz):
        """Physical coords ``(..., ndim)`` -> fractional index coords."""
        xyz = jnp.asarray(xyz)
        o = jnp.asarray(self.origin, dtype=xyz.dtype)
        h = jnp.asarray(self.spacing, dtype=xyz.dtype)
        return (xyz - o) / h

    def to_physical_coords(self, idx):
        """Fractional index coords ``(..., ndim)`` -> physical coords."""
        idx = jnp.asarray(idx)
        o = jnp.asarray(self.origin, dtype=idx.dtype)
        h = jnp.asarray(self.spacing, dtype=idx.dtype)
        return o + idx * h

    def node_coords(self):
        """Dense physical coordinates of every node, shape ``shape + (ndim,)``.

        Host-side (numpy) — used by dataset generators and tests, not on the
        hot path.
        """
        mesh = np.meshgrid(*self.axes(), indexing="ij")
        return np.stack(mesh, axis=-1)

    def contains(self, xyz) -> bool:
        """Host-side check that physical points lie inside the grid."""
        xyz = np.asarray(xyz)
        lo = np.asarray(self.origin)
        hi = lo + np.asarray(self.extent)
        return bool(np.all(xyz >= lo - 1e-9) and np.all(xyz <= hi + 1e-9))
