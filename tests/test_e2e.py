"""Integration test (SURVEY.md §4 "Integration"): config-1-shaped 2-D
crosswell tomography end-to-end on a reduced grid — posterior mean slowness
must recover the checkerboard (correlation threshold), seeded and
deterministic."""

import numpy as np
import pytest

from mceik_tpu.api import run
from mceik_tpu.io.config_io import config_from_dict

SMALL_C1 = {
    "grid": {"shape": [33, 33], "spacing": [1.0, 1.0]},
    "eikonal": {"method": "sweep", "tol": 1e-4, "max_iters": 50},
    "model": {"mode": "tomo", "inv_shape": [8, 8],
              "background_slowness": 1.0, "prior_sigma_u": 0.2,
              "sigma": 0.005},
    "sampler": {"algorithm": "rwm", "n_chains": 4, "n_warmup": 800,
                "n_samples": 1200, "thin": 4, "step_size": 0.02, "seed": 0},
    "data": {"dataset": "crosswell2d", "n_src": 6, "n_rec": 8,
             "noise": 0.005, "seed": 1234, "checker_cells": [2, 2],
             "checker_amplitude": 0.1},
}


@pytest.mark.slow
def test_crosswell_recovery():
    cfg = config_from_dict(SMALL_C1)
    summary = run(cfg, verbose=True)
    # Checkerboard recovery: posterior mean correlates with truth.
    assert summary.recovery_corr is not None
    assert summary.recovery_corr > 0.5, summary.recovery_corr
    # Acceptance adapted into a sane RWM band.
    assert 0.05 < summary.accept_rate < 0.6, summary.accept_rate
    # Posterior std should be well below the prior std in informed cells
    # (the data actually constrains the model).
    u_var = summary.post_var["params"].u
    assert np.median(u_var) < 0.2**2
