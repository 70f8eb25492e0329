"""Diagnostics (SURVEY.md §1 L6): online posterior moments (Welford),
R-hat / ESS, acceptance stats, throughput meters. All on-line and
collective-friendly — the north-star metric never requires storing full
traces."""

from mceik_tpu.diag.moments import (  # noqa: F401
    Welford,
    welford_init,
    welford_update,
    welford_update_batch,
    welford_finalize,
)
from mceik_tpu.diag.ess import split_rhat, ess  # noqa: F401
