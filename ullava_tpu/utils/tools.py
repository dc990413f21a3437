"""Misc utilities (parity: `/root/reference/utils/tools.py` timestamped
prints; plus global seeding for determinism, SURVEY.md §5.2)."""

from __future__ import annotations

import datetime
import random

import numpy as np


def datetime_print(msg: str) -> None:
    print(f"[{datetime.datetime.now():%Y-%m-%d %H:%M:%S}] {msg}", flush=True)


def set_seed(seed: int = 42):
    """Seed host-side RNGs; returns a jax PRNGKey for device-side use.
    (JAX device randomness is explicitly keyed, so the torch-style global
    cuda seeding has no equivalent/need.)"""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
