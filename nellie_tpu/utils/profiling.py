"""Tracing / profiling utilities.

The reference's observability is per-stage wall time (``run(timeit=True)``,
``run.py:54-128``); here stage timers are first-class (``pipeline.run``
returns them) and this module adds ``jax.profiler`` capture for kernel-
level TPU traces (view with TensorBoard or xprof).
"""
from __future__ import annotations

import contextlib
import json
import time

from nellie_tpu.utils.base_logger import logger


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block of work.

    >>> with trace("/tmp/nellie_trace"):
    ...     Filter(im_info).run()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("jax profiler trace written to %s", log_dir)


class StageTimer:
    """Accumulates named wall-time spans; serialisable for benchmarking."""

    def __init__(self):
        self.spans = {}

    @contextlib.contextmanager
    def span(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - start

    @property
    def total(self) -> float:
        return sum(self.spans.values())

    def report(self) -> str:
        lines = [f"{name}: {seconds:.4f}s" for name, seconds in self.spans.items()]
        lines.append(f"total: {self.total:.4f}s")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps({**self.spans, "total": self.total}, sort_keys=True)
