"""Multi-process (multi-host analogue) sharded-training validation.

Spawns 2 coordinator-connected processes x 2 virtual CPU devices each and
runs the real shard_map'd train step over the global 4-device mesh
(tools_dev/multihost_dryrun.py). The gradient psum crosses the process
boundary — the jax.distributed analogue of the reference's multi-node DDP
(reference main.py:71-77).

Marked `multihost` (excluded from the default run): it compiles the train
step in two processes, several minutes on one CPU core. Run with
  python -m pytest tests/test_multihost.py -m multihost
or directly:  python tools_dev/multihost_dryrun.py
"""
import os
import subprocess
import sys

import pytest


@pytest.mark.multihost
@pytest.mark.slow
def test_multihost_dryrun():
    script = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "tools_dev", "multihost_dryrun.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=1500, env=env)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "ALL PROCESSES OK" in out.stdout
