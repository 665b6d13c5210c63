"""Real-hardware validation as a pytest target (VERDICT r2 weak #4).

The CPU suite never executes a compiled Mosaic kernel (conftest pins
tests to the virtual CPU mesh; pallas_call runs interpret=True). These
tests make "green on real hardware" one command:

    MOLANN_RUN_TPU=1 python -m pytest -m tpu -q

They run the on-hardware check suites (scripts/tpu_validation.py — 25
PASS/FAIL checks including compiled-kernel value/gradient parity at
multiple tiles, blocked-kernel parity vs an f64 oracle, biased-MD
escape, throughput floors; and scripts/serve_pjrt_demo.py — the C++
PJRT serving chain) in SUBPROCESSES, because the TPU tunnel grants the
device to one process at a time and this pytest process is pinned to
CPU by conftest. Artifacts are written next to the repo's committed
TPU_VALIDATION_r0N.txt evidence files.

Opt-in by env var: the default suite must stay deterministic and
hardware-free, and the tunnel device cannot be shared with any other
running TPU process.
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("MOLANN_RUN_TPU") != "1",
        reason="TPU hardware checks: set MOLANN_RUN_TPU=1 (needs exclusive "
               "access to the TPU; ~10-20 min)",
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_clean(script, log_name, timeout):
    """Run a TPU script in a fresh process WITHOUT the CPU pinning this
    pytest process runs under."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, script], cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    log = os.path.join(REPO, log_name)
    with open(log, "w") as fh:
        fh.write(proc.stdout)
        fh.write(proc.stderr)
    return proc, log


def test_tpu_validation_suite():
    proc, log = _run_clean(
        os.path.join(REPO, "scripts", "tpu_validation.py"),
        "TPU_VALIDATION_pytest.txt", timeout=3600,
    )
    fails = [ln for ln in proc.stdout.splitlines()
             if ln.startswith("[FAIL]")]
    assert proc.returncode == 0 and not fails, (
        f"on-hardware validation failed (full log: {log}):\n"
        + "\n".join(fails) + "\n" + proc.stdout[-2000:]
    )
    assert "ALL CHECKS PASSED" in proc.stdout


def test_serving_container_on_hardware():
    proc, log = _run_clean(
        os.path.join(REPO, "scripts", "serve_pjrt_demo.py"),
        "SERVE_VALIDATION_pytest.txt", timeout=3600,
    )
    assert proc.returncode == 0, (
        f"serving demo failed (full log: {log}):\n" + proc.stdout[-2000:]
        + proc.stderr[-2000:]
    )
    assert "SERVE_PJRT DEMO OK" in proc.stdout
