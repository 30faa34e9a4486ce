"""Tracing/profiling utilities.

The reference's observability is Igor::ScopeTimer wall-clock scopes and
optional Score-P instrumentation (SURVEY.md §5); the TPU-native equivalents
are jax.profiler traces (viewable in TensorBoard/XProf/Perfetto) and plain
wall-clock scopes.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def scope_timer(name: str):
    """Igor::ScopeTimer analog: prints the elapsed wall time of the scope."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(f"[{name}] took {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope; open the result with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for step phases (shows up in the profile)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
