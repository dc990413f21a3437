"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference;
first-class here).

- `trace(logdir)`: context manager around `jax.profiler` trace capture —
  open the logdir with TensorBoard/XProf to see per-op TPU timelines.
- `phase_timer(name)`: wall-clock phase timing with a
  `block_until_ready` fence so async dispatch doesn't lie.
- `start_server(port)`: live profiler server for `jax.profiler` attach.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


@contextlib.contextmanager
def phase_timer(name: str, result=None):
    """Times a phase; pass `result=` a pytree to fence on before stopping
    the clock (defaults to fencing on all live arrays via a no-op)."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        fence = box.get("result", result)
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - t0
        box["seconds"] = dt
        logger.info("[phase] %s: %.3fs", name, dt)


def start_server(port: int = 9999):
    jax.profiler.start_server(port)
    logger.info("profiler server on :%d", port)
