"""Golden-run statistical acceptance (SURVEY.md §4 "Statistical
equivalence"; VERDICT r1 #6): committed long-run posterior moments with MC
error bars; CI re-runs the same reduced c1-/c2-shaped problems with a
different seed and asserts per-cell z-scores within Monte-Carlo error.

Both runs are fully seeded so the check is deterministic — calibrated once
when the golden was committed, after which any drift in the likelihood,
eikonal solver or sampler kernels moves the check mean off the golden mean
by more than MC error and fails.
"""

import numpy as np
import pytest

from mceik_tpu.diag.golden import (PROBLEMS, load_golden, recovery_corr,
                                   z_scores)


pytestmark = pytest.mark.slow

CHECK_BUDGET = {
    # name: (seed, n_warmup, n_steps)
    "c1_small": (31, 300, 2500),
    "c2_small": (32, 300, 2500),
    "c3_joint_small": (33, 300, 2500),
    # 216-dim intermediate golden (VERDICT r4 #4): GN-preconditioned MALA
    # mixes it at tau ~ 12, so a much shorter check window already puts
    # every cell's ESS in the hundreds.
    "c2_mid": (34, 300, 1200),
}


@pytest.mark.parametrize("name", sorted(PROBLEMS))
def test_golden_moments(name):
    golden = load_golden(name)
    seed, n_warmup, n_steps = CHECK_BUDGET[name]
    z, stats = z_scores(name, golden, seed, n_warmup, n_steps)
    # Per-cell agreement within MC error. 3.5 rather than 3.0: the se
    # estimates themselves carry ESS-estimation noise; the run is seeded,
    # so this is a fixed calibrated margin, not a flake allowance.
    assert z.max() < 3.5, (
        f"{name}: max |z| = {z.max():.2f} at cell {int(z.argmax())} — "
        f"posterior moments drifted beyond Monte-Carlo error "
        f"(z = {np.round(z, 2).tolist()})")
    assert np.median(z) < 1.5, (
        f"{name}: median |z| = {np.median(z):.2f} — broad moment drift")
    # The check run must actually be exploring (guards against a silently
    # stuck sampler making the z-test vacuous through huge se).
    assert stats["accept"] > 0.05, stats["accept"]
    assert float(np.median(stats["ess"])) > 20.0, stats["ess"]
    # Checkerboard-recovery integration criterion (SURVEY.md §4) where the
    # inversion basis can represent the truth (c1_small). c2_small's 3^3
    # basis cannot represent the 2-lobe checkerboard by construction —
    # its 3-D recovery criterion lives in tests/test_recovery3d.py.
    # c3_joint_small tracks the full flat params (u + hypo_raw), so the
    # slowness-only recovery correlation does not apply either.
    # c2_mid's 6^3 basis samples the (3,3,3)-point checker lobes at ~2.7
    # grid points per inv cell; the committed golden mean's measured
    # recovery correlation is 0.20 (basis/acquisition-limited at noise
    # 0.04), so the correlation criterion does not apply — c2_mid's
    # purpose is the moment z-test at 216 dims, not structure recovery.
    RECOVERY_MIN = {"c1_small": 0.5, "c2_small": None, "c3_joint_small": None,
                    "c2_mid": None}
    if RECOVERY_MIN[name] is not None:
        corr = recovery_corr(name, stats["mean"])
        assert corr > RECOVERY_MIN[name], f"{name}: recovery_corr={corr:.3f}"
