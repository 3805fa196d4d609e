"""Wall-clock iteration stats for progress/ETA (ref: src/utils/timer.py:4-44)."""
from __future__ import annotations

import time
from typing import Dict


class Timer:
    def __init__(self, start_iter: int, total_iter: int):
        self.start_time = time.time()
        self.last_time = self.start_time
        self.start_iter = start_iter
        self.last_iter = start_iter
        self.total_iter = total_iter

    def get_time_stat(self, itr: int) -> Dict[str, float]:
        now = time.time()
        runtime = now - self.start_time
        interval = now - self.last_time
        d_iter = max(1, itr - self.last_iter)
        time_per_iter = interval / d_iter
        remaining = max(0, self.total_iter - itr)
        self.last_time = now
        self.last_iter = itr
        return {
            "runtime_sec": runtime,
            "interval_sec": interval,
            "time_per_iter": time_per_iter,
            "eta_hours": time_per_iter * remaining / 3600.0,
        }
