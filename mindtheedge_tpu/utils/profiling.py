"""Tracing / profiling hooks — net-new surface (the reference has none;
SURVEY.md section 5 lists profiling as absent upstream).

* ``StepTimer``: per-step wall timing with warmup skip and percentile report.
* ``trace``: context manager around ``jax.profiler`` traces (TensorBoard
  format) — degrades to a no-op when the backend can't trace (the remote
  relay cannot).
* ``log_compile_metrics``: surface XLA compile counts/time from JAX's
  monitoring registry when available.
"""

import contextlib
import time

import numpy as np


class StepTimer:
    def __init__(self, warmup=2):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            'steps': len(arr),
            'mean_s': float(arr.mean()),
            'p50_s': float(np.percentile(arr, 50)),
            'p95_s': float(np.percentile(arr, 95)),
            'max_s': float(arr.max()),
        }


@contextlib.contextmanager
def trace(log_dir='/tmp/mte_trace', enabled=True):
    """jax.profiler trace that degrades gracefully on backends that can't."""
    if not enabled:
        yield
        return
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:
        print(f'profiler trace unavailable: {type(e).__name__}: {e}')
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f'profiler trace written to {log_dir}')
            except Exception:
                pass


def device_memory_stats():
    """Per-device memory stats when exposed by the backend."""
    import jax
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
