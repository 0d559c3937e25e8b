#!/bin/bash
# Poll the tunnel; the moment it answers, refresh benchmarks/results.json
# (bench_all) and the headline (bench.py).  These are the two remaining
# items in docs/TPU_QUEUE.md — run them unattended so a brief healthy
# window is not wasted.  Logs to /tmp/r4_bench_drain.log.
set -u
cd /root/repo
LOG=/tmp/r4_bench_drain.log
echo "==== r4 bench drain started $(date -u) ====" > "$LOG"
probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
EOF
}
until probe; do
  echo "[$(date -u +%H:%M:%S)] tunnel down, retrying in 120s" >> "$LOG"
  sleep 120
done
echo "[$(date -u +%H:%M:%S)] tunnel up" >> "$LOG"
step() {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] $name ===" >> "$LOG"
  timeout "$@" >> "$LOG" 2>&1
  echo "--- [$(date -u +%H:%M:%S)] $name rc=$?" >> "$LOG"
}
# Baseline first (CLAUDE.md: re-measure the known baseline before trusting
# anything), then the full metric refresh, then the headline line again.
step baseline 900 python bench.py
step bench_all 7200 python benchmarks/bench_all.py
step headline 900 python bench.py
echo "==== r4 bench drain finished $(date -u) ====" >> "$LOG"
touch /tmp/r4_bench_drain.done
