"""Root pytest conftest: isolate tests from the ambient TPU session.

The container preloads a TPU PJRT plugin in every Python interpreter via a
PYTHONPATH sitecustomize and pins JAX_PLATFORMS to the single real TPU
chip. Tests must run on a virtual 8-device CPU mesh instead (fast,
parallel-safe, and how multi-chip sharding is validated — SURVEY.md §4).
sitecustomize has already run by the time this file is imported, so we
re-exec pytest once with a scrubbed environment.
"""

import os
import sys

_GUARD = "ULLAVA_TPU_TEST_REEXECED"


def _needs_scrub() -> bool:
    if os.environ.get(_GUARD):
        return False
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
        return True
    return "axon" in os.environ.get("PYTHONPATH", "")


if _needs_scrub():
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
    )
    xla_flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )
