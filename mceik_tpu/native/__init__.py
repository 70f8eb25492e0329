"""Native (C++) components: the serial FSM golden-oracle solver
(SURVEY.md §2.2) built on demand with g++ and bound via ctypes."""

from mceik_tpu.native.fsm import fsm_solve, have_native  # noqa: F401
