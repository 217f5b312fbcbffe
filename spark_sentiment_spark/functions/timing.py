"""Timing utility — capability of the reference's log-only timer
(SRC/utils/Timing.scala:9-15): label a block, accumulate wall-clock,
report. Used by train()/analyze() callers that want stage timings; unlike
the reference (log4j only) the measurements are also returned as data.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

log = logging.getLogger("spark_sentiment_spark.timing")


class Timing:
    def __init__(self) -> None:
        self.measurements: dict[str, float] = {}

    @contextmanager
    def time(self, label: str):
        """``with timer.time("fitting"): ...`` — mirrors ``Timing.time``."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.measurements[label] = self.measurements.get(label, 0.0) + dt
            log.info("%s took %.3fs", label, dt)

    def report(self) -> dict[str, float]:
        return dict(self.measurements)
