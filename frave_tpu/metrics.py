"""In-memory metrics/observability sink.

Replaces the reference's file side-channels and ad-hoc prints
(SURVEY.md section 5): unconditional ./mse/errors_{ch}.mse dumps
(prediction.rs:30-37,300), optional ./coefficients/*.coef histogram dumps
(prediction.rs:17-28), per-context entropy prints (prediction.rs:306-313)
and per-channel bpp prints (entropy_coding.rs:337-340). Metrics are
recorded in memory, optionally echoed when verbose, and drainable by
tools (the CLI `optimize` analog consumes prediction-error metrics
directly instead of re-reading ./mse files like optimize.rs:103-126).
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Dict, List, Optional


class Metrics:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._scalars: Dict[str, List[float]] = defaultdict(list)
        self._series: Dict[str, List[Any]] = defaultdict(list)
        self.verbose = False

    def record(self, name: str, value: float) -> None:
        with self._lock:
            self._scalars[name].append(float(value))
        if self.verbose:
            print(f"[frave] {name} = {value}")

    def record_array(self, name: str, value) -> None:
        """Bulk payloads (histograms, residual vectors) — the
        emit_coefficients / mse-file replacement."""
        with self._lock:
            self._series[name].append(value)

    def last(self, name: str) -> Optional[float]:
        with self._lock:
            v = self._scalars.get(name)
            return v[-1] if v else None

    def mean(self, name: str) -> Optional[float]:
        with self._lock:
            v = self._scalars.get(name)
            return sum(v) / len(v) if v else None

    def arrays(self, name: str) -> List[Any]:
        with self._lock:
            return list(self._series.get(name, []))

    def snapshot(self) -> Dict[str, List[float]]:
        with self._lock:
            return {k: list(v) for k, v in self._scalars.items()}

    def reset(self) -> None:
        with self._lock:
            self._scalars.clear()
            self._series.clear()

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)


_global = Metrics()


def get_metrics() -> Metrics:
    return _global
