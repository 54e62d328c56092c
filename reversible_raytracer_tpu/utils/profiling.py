"""Profiling hooks (SURVEY.md §5.1).

The reference's equivalent was `THEANO_FLAGS=profile=1` per-op timing; the
TPU-native version is an xprof/XLA trace viewable in TensorBoard or Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rrt_trace"):
    """Capture a device trace (kernel timings, HBM traffic) around a block:

        with profiling.trace("/tmp/tr"):
            step(...); jax.block_until_ready(...)

    Open with TensorBoard's profile plugin or xprof."""
    with jax.profiler.trace(logdir):
        yield
    print(f"trace written to {logdir}")


def annotate(name: str):
    """Named region that shows up in traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
