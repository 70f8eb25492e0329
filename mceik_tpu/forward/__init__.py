"""Forward traveltime prediction (SURVEY.md §1 L1).

Batched eikonal solves (traveltime tables) + receiver interpolation,
returning predicted arrival times ``t_pred``. Replaces the reference's C
driver + HDF5 traveltime-table machinery with in-memory vmapped solves and
XLA gathers (SURVEY.md §2.1 "Traveltime tables", "Receiver interpolation").
"""

from mceik_tpu.forward.predict import (  # noqa: F401
    interp_tables,
    predict_events,
    predict_tomo,
    traveltime_tables,
)
