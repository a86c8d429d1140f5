"""Wall-clock section timing + JAX profiler hooks.

Parity with vmc_fluids/util.py:35-52 (named start/stop sections with
history), extended with optional jax.profiler trace capture (the reference
has no profiler integration, SURVEY.md section 5.1)."""

from __future__ import annotations

import contextlib
import time

import jax


class Timings:
    def __init__(self):
        self.timing_dict = {}

    def start_timing(self, key: str):
        self.timing_dict.setdefault(key, []).append(-time.perf_counter())

    def stop_timing(self, key: str, waitFor=None):
        if waitFor is not None:
            jax.block_until_ready(waitFor)
        self.timing_dict[key][-1] += time.perf_counter()

    @contextlib.contextmanager
    def section(self, key: str, waitFor=None):
        self.start_timing(key)
        try:
            yield
        finally:
            self.stop_timing(key)

    def last(self, key: str) -> float:
        return self.timing_dict[key][-1]

    def print_timings(self):
        total = 0.0
        for key, value in self.timing_dict.items():
            print(f"\t > {key}: {value[-1]}")
            total += value[-1]
        print(f"\t > TOTAL: {total}")


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a TPU profiler trace around a code region (view with
    tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
