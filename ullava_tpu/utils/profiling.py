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
def trace(logdir: str, python_tracer: bool = False):
    # The host python tracer emits ~1M events per serving batch, and the
    # xplane->trace.json converter caps total events — with it on, the
    # device XLA-Ops track gets crowded out of the JSON export entirely.
    # Off by default; the device timeline is what these traces are for.
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 1 if python_tracer else 0
    opts.host_tracer_level = 2 if python_tracer else 1
    jax.profiler.start_trace(logdir, profiler_options=opts)
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
