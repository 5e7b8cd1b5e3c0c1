"""Profiling helpers: named scopes for the kernel stages + a trace context.

Usage:
    with profile_trace("/tmp/sangnom-trace"):   # XProf/Perfetto dump
        out = sangnom2(clip)

Stage scopes are applied inside the ops so kernels and the surrounding XLA
glue are attributable in the trace viewer.
"""

from __future__ import annotations

import contextlib

import jax


def stage_scope(name: str):
    """A named scope for one pipeline stage (shows up in XProf timelines)."""
    return jax.named_scope(f"sangnom/{name}")


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace of everything inside the context."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
