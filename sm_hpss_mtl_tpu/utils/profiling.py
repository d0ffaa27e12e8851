"""Tracing / profiling helpers.

The reference records only coarse ``time.process_time()`` spans
(SURVEY.md §5); here the same wall/process timing is kept (stage_timer,
persisted into checkpoint metadata by the fit loop) and full device
traces are available through ``jax.profiler`` for TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def stage_timer(name: str, sink: dict | None = None, verbose: bool = True):
    """Time a pipeline stage; record into ``sink[name]`` seconds."""
    t0 = time.perf_counter()
    tp0 = time.process_time()
    try:
        yield
    finally:
        wall = time.perf_counter() - t0
        cpu = time.process_time() - tp0
        if sink is not None:
            sink[name] = {"wall_s": wall, "process_s": cpu}
        if verbose:
            print(f"[timer] {name}: wall {wall:.3f}s process {cpu:.3f}s",
                  flush=True)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard / XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
