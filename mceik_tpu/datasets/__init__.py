"""Synthetic dataset generators (SURVEY.md §2.1 "Synthetic data generators").

Datasets are code, not files: deterministic PRNG-keyed builders for the five
driver-blessed workload configs (checkerboard models, crosswell geometry,
surface-station/earthquake geometry, noisy arrivals)."""

from mceik_tpu.datasets.synthetic import (  # noqa: F401
    checkerboard_slowness,
    crosswell_dataset,
    checkerboard3d_dataset,
    events_dataset,
    make_dataset,
)
