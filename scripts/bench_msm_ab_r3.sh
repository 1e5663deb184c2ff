#!/bin/bash
# Round-3 MSM A/B on the real chip: pregather (round-2 default) vs the
# log-depth tree accumulate, plus tree HBM-budget / split-target tuning.
# Every leg pins its knobs EXPLICITLY (round-2 advisor: legs relying on
# ambient defaults mislabel results when defaults move).
# ONE TPU process at a time (CLAUDE.md); short timeouts so a hung run
# doesn't eat the session.
set -u
cd /root/repo

run_msm() { # size tag [env...]
  local SZ=$1; shift
  local TAG=$1; shift
  echo "=== MSM $SZ [$TAG] $* ===" >&2
  timeout 2400 env BENCH_MSM=1 BENCH_MSM_SIZE=$SZ BENCH_NO_FALLBACK=1 "$@" \
    python bench.py 2>/tmp/bench_msm_${TAG}.log \
    || echo "{\"metric\": \"bn254_msm_points_per_sec\", \"size\": $SZ, \"tag\": \"$TAG\", \"error\": \"rc=$?\"}"
}

{
  run_msm 65536 s16_pre          H2T_MSM_ACCUM=pre
  run_msm 65536 s16_tree         H2T_MSM_ACCUM=tree
  run_msm 65536 s16_tree_b30     H2T_MSM_ACCUM=tree H2T_MSM_BUDGET_LOG2=30
  run_msm 65536 s16_tree_b30_t512 H2T_MSM_ACCUM=tree H2T_MSM_BUDGET_LOG2=30 BENCH_MSM_TARGET=512
} > /tmp/bench_msm_ab_r3.jsonl
echo "AB QUEUE DONE" >&2
cat /tmp/bench_msm_ab_r3.jsonl >&2
