#!/bin/bash
# Run every TPU-blocked measurement queued while the axon relay was dead
# (round 3: the relay died mid-round — CLAUDE.md "NEVER kill a process
# mid-TPU-execution" — and cannot be restarted from inside the container).
#
# Usage:  bash tools_dev/run_deferred_tpu.sh [out_dir]
#
# Probes the relay first and exits 2 immediately if it is down. Each step is
# timeout-bounded and logged separately so one wedged program cannot eat the
# whole budget; results land in <out_dir>/ (default /tmp/tpu_deferred).
set -u
OUT=${1:-/tmp/tpu_deferred}
mkdir -p "$OUT"
cd /root/repo

python - <<'EOF' || exit 2
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8082), timeout=5).close()
except OSError:
    print("relay dead: nothing listening on 127.0.0.1:8082", file=sys.stderr)
    sys.exit(1)
print("relay alive")
EOF

run() {  # run <name> <budget_s> <cmd...>
  local name=$1 budget=$2; shift 2
  echo "=== $name (budget ${budget}s) ==="
  timeout "$budget" "$@" >"$OUT/$name.log" 2>&1
  echo "$name exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

# 1. headline bench (forward kf/s + guarded train_step_ms) — the number the
#    driver records; re-validates 65.3 kf/s after round-3 changes.
run bench 1800 python bench.py

# 2. BP gather-adjoint A/B: scatter vs sorted segment-sum
#    (cfg.model.bp_backward; flip the default in config.py if sorted wins).
run bp_backward 1800 python tools_dev/bench_bp_backward.py

# 3. remat-mode timing A/B (memory half already done on CPU:
#    tools_dev/remat_memory_analysis.py).
run train_remat 2400 python tools_dev/bench_train_remat.py

# 4. train-step trace at full scale (hot-spot attribution for the
#    ~650 ms/step; check whether the round-3 batched-auction matcher and any
#    bp_backward flip moved the needle).
run train_profile 2400 python tools_dev/profile_train_step.py

echo "=== done; logs in $OUT ==="
