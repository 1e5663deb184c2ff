#!/bin/bash
# Round-3 recorded-bench queue (run AFTER scripts/bench_msm_sweep_r3.sh).
# ONE TPU process at a time; no heavy CPU work while a leg is timing.
#
#  1. headline: batched-traced zkevm-shape K=16 batch 32 (proves 32 proofs
#     on first run — hours; per-proof /tmp pickles + repo bench_fixtures/
#     keep every completed proof, so a killed run resumes cheaply)
#  2. batch-scaling legs via ZKEVM_DUP
#  3. outer-proof wall clock (aggregator k=21, 2 proofs)
set -u
cd /root/repo

run() { # tag timeout [env...]
  local TAG=$1; shift
  local TMO=$1; shift
  echo "=== [$TAG] $* ===" >&2
  timeout "$TMO" env BENCH_NO_FALLBACK=1 H2T_BV_PROFILE=1 "$@" \
    python bench.py 2>/tmp/bench_${TAG}.log \
    || echo "{\"tag\": \"$TAG\", \"error\": \"rc=$?\"}"
}

{
  run zkevm_b32 28800
  run zkevm_b64 3600 ZKEVM_DUP=2
  run zkevm_b128 3600 ZKEVM_DUP=4
  run outer_k21 7200 BENCH_OUTER=1 OUTER_K=21 OUTER_NPROOFS=2
} > /tmp/bench_queue_r3.jsonl
echo "QUEUE DONE" >&2
cat /tmp/bench_queue_r3.jsonl >&2
