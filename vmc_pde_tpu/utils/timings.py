"""Wall-clock section timing + JAX profiler hooks.

Covers the reference's per-section timing role (vmc_fluids/util.py:35-52)
with a different mechanism: sections are tracked as explicit start
timestamps plus a completed-duration history (rather than sign-flipped
accumulators), nesting/misuse raises instead of corrupting state, and a
context manager + jax.profiler trace capture are added (the reference has no
profiler integration, SURVEY.md section 5.1).
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timings:
    """Named wall-clock sections with per-call history.

    ``section(key)`` / ``start_timing(key)`` + ``stop_timing(key)`` record
    one duration per completed span into ``timing_dict[key]``.
    """

    def __init__(self):
        self.timing_dict: dict[str, list[float]] = {}
        self._open: dict[str, float] = {}

    def start_timing(self, key: str) -> None:
        if key in self._open:
            raise RuntimeError(f"timing section {key!r} is already open")
        self._open[key] = time.perf_counter()

    def stop_timing(self, key: str, waitFor=None) -> None:
        if waitFor is not None:
            # time the device work, not just the dispatch
            jax.block_until_ready(waitFor)
        try:
            t0 = self._open.pop(key)
        except KeyError:
            raise RuntimeError(f"timing section {key!r} was never started")
        self.timing_dict.setdefault(key, []).append(time.perf_counter() - t0)

    @contextlib.contextmanager
    def section(self, key: str, waitFor=None):
        self.start_timing(key)
        try:
            yield
        finally:
            self.stop_timing(key, waitFor=waitFor)

    def last(self, key: str) -> float:
        return self.timing_dict[key][-1]

    def totals(self) -> dict[str, float]:
        return {k: sum(v) for k, v in self.timing_dict.items()}

    def print_timings(self) -> None:
        """Per-step timing report; keeps the reference's log line shape
        (util.py:48-52) so existing log scrapers keep working."""
        latest = {k: v[-1] for k, v in self.timing_dict.items() if v}
        for key, dt in latest.items():
            print(f"\t > {key}: {dt}")
        print(f"\t > TOTAL: {sum(latest.values())}")


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a TPU profiler trace around a code region (view with
    tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
