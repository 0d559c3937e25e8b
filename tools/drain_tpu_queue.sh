#!/bin/bash
# Drain docs/TPU_QUEUE.md unattended the moment the tunnel answers.
# Each step logs to /tmp/tpu_drain.log and continues on failure (a flaky
# tunnel shouldn't kill the rest of the queue); exit codes are recorded so
# a human (or the next session) can triage.  Order per docs/TPU_QUEUE.md:
# baseline re-measure -> test-tpu -> experiments -> bench_all -> headline.
set -u
cd /root/repo
LOG=/tmp/tpu_drain.log
step() {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] $name ===" >> "$LOG"
  timeout "$@" >> "$LOG" 2>&1
  echo "--- [$(date -u +%H:%M:%S)] $name rc=$?" >> "$LOG"
}
echo "==== drain started $(date -u) ====" > "$LOG"
# 1. Baseline first (CLAUDE.md: re-measure the known baseline before any A/B)
step baseline 900 python bench.py
# 2. Hardware re-validation of everything CPU-verified this round
step test-tpu 5400 make test-tpu
# 3. Queued experiments (A/B inside one process each)
step exp_adaptive_morph 2400 python exp/exp_adaptive_morph.py
step exp_hist_build 2400 python exp/exp_hist_build.py
step exp_k2_i16 2400 python exp/exp_k2_i16.py
# 4. Full metric refresh (writes benchmarks/results.json)
step bench_all 5400 python benchmarks/bench_all.py
# 5. Headline again post-refresh
step headline 900 python bench.py
echo "==== drain finished $(date -u) ====" >> "$LOG"
touch /tmp/tpu_drain.done
