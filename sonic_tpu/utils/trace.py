"""Profiling hooks — jax.profiler integration (SURVEY.md §5 tracing entry).

The reference's only performance tooling is the criterion harness; here the
benchmark runner (and any caller) can capture full XLA traces:

    with device_trace("/tmp/sonic-trace"):
        proof, oracle = prove(...)

then inspect with TensorBoard / xprof. `annotate` adds named spans so the
protocol phases (commit_r, t_poly, openings, hsc) are visible in the trace.
"""
from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def device_trace(log_dir: str | None = None):
    """Capture a jax.profiler trace for the enclosed block (no-op when
    log_dir is None and SONIC_TPU_TRACE_DIR is unset)."""
    log_dir = log_dir or os.environ.get("SONIC_TPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named span context manager for phase attribution inside traces."""
    return jax.profiler.TraceAnnotation(name)
