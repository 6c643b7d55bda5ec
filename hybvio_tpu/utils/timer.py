"""Timing / profiling: per-label, per-frame wall-clock statistics.

Port of the reference RAII scope timers (reference: src/util/timer.{hpp,cpp}):
`TimeStats` accumulates named scopes, delimited into frames by start_frame(),
and reports per-frame averages per label at exit (the reference's `-timer`
flag output). For device work, times are host wall-clock around dispatch; use
`blocking=True` scopes (block_until_ready on a probe array) when measuring
jitted sections.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class TimeStats:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.frames = 0

    def start_frame(self) -> None:
        if self.enabled:
            self.frames += 1

    @contextmanager
    def scope(self, name: str, probe=None):
        """Time a named scope (reference: `timer(stats, name)` macro).

        probe: optional array; block_until_ready is called on it at scope exit
        so device work inside the scope is attributed correctly.
        """
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if probe is not None:
                import jax

                jax.block_until_ready(probe)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add_sample(self, name: str, seconds: float) -> None:
        """Accumulate one externally timed sample into a label (used by the
        per-frame StageProbes attribution: one sample per label per frame,
        so per_frame_timings reports the mean over the actual run)."""
        self.totals[name] += seconds
        self.counts[name] += 1

    def add_attribution(self, name: str, ms_per_frame: float) -> None:
        """Record an externally measured per-frame stage time.

        The fused XLA programs cannot be scope-timed from the host mid-frame
        (the reference scope-times inside its single thread,
        ransac_pipeline.cpp:206-283); stage attribution instead times
        dedicated sub-programs on the session's own data
        (utils/stage_attribution.py) and folds the result in here so the
        `-timer` report carries the reference's per-label table."""
        self._attrib = getattr(self, "_attrib", {})
        self._attrib[name] = ms_per_frame

    def per_frame_timings(self) -> Dict[str, float]:
        """Mean milliseconds per frame per label (reference:
        TimeStats::perFrameTimings)."""
        n = max(self.frames, 1)
        out = {k: 1000.0 * v / n for k, v in sorted(self.totals.items())}
        out.update(getattr(self, "_attrib", {}))
        return out

    def report(self) -> str:
        lines = [f"--- per-frame timings over {self.frames} frames ---"]
        attrib = getattr(self, "_attrib", {})
        for k, ms in self.per_frame_timings().items():
            tag = "  [attributed]" if k in attrib else f"  (x{self.counts[k]})"
            lines.append(f"{ms:10.3f} ms  {k}{tag}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self._attrib = {}
        self.frames = 0


# global singletons like the reference's odometry::TIME_STATS / slam::TIME_STATS
ODOMETRY_TIME_STATS = TimeStats(enabled=False)
SLAM_TIME_STATS = TimeStats(enabled=False)
