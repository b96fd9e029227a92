"""Profiling and tracing hooks.

The reference has no profiler integration at all — only wall-clock spans
around the epoch loops (``train.py:235, 260-262``; SURVEY §5). Here tracing
is first-class: a config-driven ``jax.profiler`` window that captures XLA
device traces (viewable in XProf/Perfetto) for a chosen span of steps, plus
a lightweight step timer that records per-step wall times without any
device synchronization (it timestamps dispatches; the async gap shows up as
a saw-tooth that collapses once the input pipeline keeps up).

Config keys (all optional):
  profile_dir:        directory for the trace (default exp_dir/traces)
  profile_start_step: first profiled step   (default 10)
  profile_num_steps:  how many steps to capture (default 5, 0 = disabled)
"""

from __future__ import annotations

import logging
import os
import time
from typing import List, Optional

logger = logging.getLogger(__name__)


class StepProfiler:
    """Start/stop a jax.profiler trace around a window of training steps."""

    def __init__(self, params, exp_dir: str, enabled: bool = True):
        self.num_steps = int(getattr(params, "profile_num_steps", None) or 0)
        self.start_step = int(getattr(params, "profile_start_step", None) or 10)
        self.trace_dir = str(
            getattr(params, "profile_dir", None) or os.path.join(exp_dir, "traces")
        )
        self.enabled = enabled and self.num_steps > 0
        self._active = False
        self._done = False

    def step(self, global_step: int) -> None:
        """Call once per training step with the global step index."""
        if not self.enabled or self._done:
            return
        import jax

        if not self._active and global_step >= self.start_step:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            logger.info("profiler: tracing steps %d..%d -> %s",
                        global_step, global_step + self.num_steps, self.trace_dir)
        elif self._active and global_step >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.info("profiler: trace written to %s", self.trace_dir)

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True


class StepTimer:
    """Dispatch-side per-step wall times (no device sync)."""

    def __init__(self):
        self._last: Optional[float] = None
        self.times: List[float] = []

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def reset(self) -> dict:
        """Summarize and clear. Returns {mean, p50, max} in seconds."""
        out = {}
        if self.times:
            s = sorted(self.times)
            out = {
                "step_time_mean": sum(s) / len(s),
                "step_time_p50": s[len(s) // 2],
                "step_time_max": s[-1],
            }
        self.times = []
        self._last = None
        return out
