"""Budgeted regression test for the driver's multi-chip dryrun (VERDICT r3 #1).

Round 3 shipped a driver-visible failure: `python __graft_entry__.py
multichip 8` timed out compiling jit_init on the 1-core host because
XLA:CPU LLVM-compiles every fusion kernel as its own module at full effort
(and the rounds-1/2 passes were riding a warm same-VM AOT cache). The fix
drops LLVM effort inside dryrun_multichip; this test pins the COLD-cache
wall time under the driver budget by pointing HOME at a fresh tmp dir so
the persistent compile cache starts empty.
"""
import os
import subprocess
import sys
import time

import pytest

BUDGET_S = 570  # driver kills at ~590-600; leave headroom


@pytest.mark.slow
def test_dryrun_multichip_cold_within_budget(tmp_path):
    env = dict(os.environ)
    env["HOME"] = str(tmp_path)  # cold persistent compile cache
    env.pop("JAX_PLATFORMS", None)  # dryrun forces cpu itself
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "multichip", "8"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=BUDGET_S)
    dt = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in proc.stdout
    print(f"cold dryrun wall time: {dt:.0f}s (budget {BUDGET_S}s)")
