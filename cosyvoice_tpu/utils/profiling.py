"""First-class tracing/profiling (SURVEY section 5: the reference only has
ad-hoc perf_counter pairs and RTF log lines).

  * `trace(dir)` context: captures a jax.profiler trace viewable in
    TensorBoard/Perfetto (device timelines, HLO cost attribution).
  * `StageTimer`: per-stage wall timers with RTF summaries for the
    llm/flow/vocoder pipeline.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self, audio_seconds: float | None = None) -> dict:
        out = {k: {"total_s": v, "calls": self.counts[k]}
               for k, v in self.totals.items()}
        if audio_seconds:
            for k in out:
                out[k]["rtf"] = self.totals[k] / audio_seconds
        return out
