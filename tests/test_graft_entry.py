"""Driver-contract tests for __graft_entry__.

The graft driver invokes `dryrun_multichip(8)` in the PINNED environment
(JAX_PLATFORMS set to the real single-chip TPU platform, a TPU-plugin
sitecustomize on PYTHONPATH). Round 1 failed exactly there, so this test
reproduces the driver's invocation path: a subprocess with a hostile env
— NOT the scrubbed env the pytest conftest provides — calling
dryrun_multichip, which must self-provision its 8-device virtual CPU
mesh. Replaces the torchrun/DeepSpeed launch surface
(/root/reference/shells/finetune.sh:3).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_survives_pinned_driver_env():
    env = dict(os.environ)
    # Simulate the driver env: platform pinned to a non-CPU backend and a
    # TPU-plugin sitecustomize dir on PYTHONPATH. dryrun_multichip must
    # not import jax under this env; it must re-exec scrubbed.
    env["JAX_PLATFORMS"] = "axon"
    env["PYTHONPATH"] = os.pathsep.join(
        ["/nonexistent/.axon_site", env.get("PYTHONPATH", ""), REPO]
    )
    env.pop("ULLAVA_TPU_TEST_REEXECED", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    assert "dryrun_multichip ok" in proc.stdout


def test_dryrun_runs_inline_when_env_already_provides_devices():
    # Under the scrubbed 8-device pytest env the check should say "run
    # inline" (no subprocess): guards against pointless double-exec.
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
        assert g._env_provides(8)
    finally:
        sys.path.remove(REPO)
