"""Tracing / profiling subsystem.

The reference has no profiler (only wall-clock ETA stats, ref:
src/utils/timer.py). Here: a jax.profiler trace context for device timelines
plus a stage timer that forces device synchronization per stage, so the
per-stage numbers are honest on backends with async dispatch (on the axon
tunnel, block_until_ready can return early — sync via a small device_get).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (viewable with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of all device work feeding `tree`."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "block_until_ready")]
    for l in leaves:
        l.block_until_ready()
    if leaves:
        # block_until_ready can be a no-op over the tunnel; a scalar fetch
        # is a reliable barrier.
        jax.device_get(leaves[0].ravel()[0])


class StageTimer:
    """Accumulates wall time per named stage across iterations."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_tree=None) -> Iterator[None]:
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_sec": self.totals[k], "count": self.counts[k],
                "mean_sec": self.totals[k] / max(1, self.counts[k])}
            for k in sorted(self.totals)
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()

    def log(self, logger) -> None:
        for k, v in self.report().items():
            logger.info(f"[stage] {k}: {v['mean_sec'] * 1000:.1f} ms/call "
                        f"x{v['count']} ({v['total_sec']:.2f}s total)")
