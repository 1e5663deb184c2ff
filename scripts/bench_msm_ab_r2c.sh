#!/bin/bash
# Round-2 (cont.) MSM A/B on the real chip: pregather-vs-loop-gather and
# window width c, at 2^16 first (cheap) then 2^20 for the winner.
# ONE TPU process at a time (CLAUDE.md); short timeouts so a hung run
# doesn't eat the session.
set -u
cd /root/repo

run_msm() { # size tag [env...]
  local SZ=$1; shift
  local TAG=$1; shift
  echo "=== MSM $SZ [$TAG] $* ===" >&2
  timeout 1200 env BENCH_MSM=1 BENCH_MSM_SIZE=$SZ BENCH_NO_FALLBACK=1 "$@" \
    python bench.py 2>/tmp/bench_msm_${TAG}.log \
    || echo "{\"metric\": \"bn254_msm_points_per_sec\", \"size\": $SZ, \"tag\": \"$TAG\", \"error\": \"rc=$?\"}"
}

{
  # Baseline legs pin H2T_MSM_PREFETCH=0 explicitly: the repo default has
  # since moved (pregather, then the Pallas accumulate), so an unset env
  # would compare the new default against itself and mislabel the rows.
  run_msm 65536   s16_c8      H2T_MSM_PREFETCH=0
  run_msm 65536   s16_c8_pre  H2T_MSM_PREFETCH=1
  run_msm 65536   s16_c8_tree H2T_MSM_ACCUM=tree
  run_msm 65536   s16_c10     BENCH_MSM_C=10 H2T_MSM_PREFETCH=0
  run_msm 65536   s16_c12     BENCH_MSM_C=12 H2T_MSM_PREFETCH=0
  run_msm 65536   s16_c10_pre BENCH_MSM_C=10 H2T_MSM_PREFETCH=1
} > /tmp/bench_msm_ab.jsonl
echo "AB QUEUE DONE" >&2
cat /tmp/bench_msm_ab.jsonl >&2
