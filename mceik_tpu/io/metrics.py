"""Structured metrics logging (SURVEY.md §5 "Metrics / logging"):
per-segment JSONL records to stdout and an optional file. Replaces the
reference's free-form stdout misfit prints with machine-readable lines."""

from __future__ import annotations

import json
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stream=None,
                 prefix: str = "mceik"):
        self._file = open(path, "a") if path else None
        self._stream = stream if stream is not None else sys.stdout
        self._prefix = prefix
        self._t0 = time.perf_counter()

    def log(self, record: dict) -> None:
        rec = {"t": round(time.perf_counter() - self._t0, 3), **record}
        line = json.dumps(rec)
        if self._stream is not None:
            print(f"[{self._prefix}] {line}", file=self._stream, flush=True)
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
