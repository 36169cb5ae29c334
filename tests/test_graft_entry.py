"""Driver-contract tests for ``__graft_entry__``.

Round-1 `MULTICHIP_r01.json` failed because ``dryrun_multichip`` relied on
the environment to provide >= n devices; the driver process sees one axon
chip and its sitecustomize pins the backend before env vars apply.  These
tests run the driver's LITERAL invocation in a clean subprocess (no conftest
env, no XLA_FLAGS) to prove the self-bootstrap path works.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(n: int, extra_env: dict | None = None) -> str:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # Keep subprocesses on CPU-only to stay fast/deterministic in CI, but do
    # NOT set the device-count flag — the bootstrap must create the devices.
    env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    out = subprocess.run(
        [sys.executable, "-c",
         f"from __graft_entry__ import dryrun_multichip; dryrun_multichip({n})"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, f"rc={out.returncode}\n{out.stdout}\n{out.stderr}"
    return out.stdout


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_8_devices():
    stdout = _run_dryrun(8)
    assert "dryrun_multichip(n=8)" in stdout and "ok" in stdout
    assert "'data': 4" in stdout and "'model': 2" in stdout


@pytest.mark.slow
def test_dryrun_multichip_odd_n():
    stdout = _run_dryrun(3)
    assert "dryrun_multichip(n=3)" in stdout and "ok" in stdout


@pytest.mark.slow
def test_dryrun_multichip_with_preset_device_flag():
    # When the environment already provides enough devices (conftest-style
    # XLA flag), the bootstrap must be a no-op and use them directly.
    stdout = _run_dryrun(
        8, {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert "dryrun_multichip(n=8)" in stdout and "ok" in stdout


def test_bootstrap_devices_in_process():
    # In-process (conftest provides 8 CPU devices): passthrough path.
    from __graft_entry__ import _bootstrap_devices

    devs = _bootstrap_devices(8)
    assert len(devs) == 8
    devs3 = _bootstrap_devices(3)
    assert len(devs3) == 3
