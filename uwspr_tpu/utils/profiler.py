"""XLA profiler integration (SURVEY.md section 5: tracing/profiling).

Wraps jax.profiler so any pipeline run can produce a TensorBoard-loadable
trace of the compiled programs, DMAs, and collectives:

    from uwspr_tpu.utils.profiler import trace
    with trace("/tmp/uwspr-trace"):
        decoder.decode_window_ri(window)

or from the CLI: ``uwspr decode file.c2 --trace-dir /tmp/uwspr-trace``.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the enclosed block to ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name: str):
    """Named sub-span inside a trace (shows up in the profiler timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


__all__ = ["trace", "annotate"]
