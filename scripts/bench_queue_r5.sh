#!/bin/bash
# Round-5 recorded-bench queue (TEMPLATE — the round-5 legs actually ran
# ad hoc as the bug hunt unfolded; artifacts: BENCH_OUTER_r05,
# BENCH_ZKEVM_r05, BENCH_SCALING_r05, BENCH_MSM_r05, BENCH_ZKEVM18_r05,
# MULTICHIP_BV_r05). Run ONLY when the TPU is free (one process
# at a time on the axon tunnel). Order: cheapest-blocking first.
#   1. Pallas 2^21 repro (grid leg, then n21) — the round-4 off-curve bug
#   2. headline zkevm batch-32 re-record (new tape scheduler)
#   3. batch-scaling legs 4/8/16 (compile per batch size; tape rewrite
#      makes these affordable)
#   4. MSM sweep signed-vs-unsigned A/B at 2^16/2^20/2^22
# Every leg appends JSONL; artifacts are assembled at the end.
set -u
cd /root/repo
R=05

echo "=== repro grid leg ===" >&2
timeout 5400 python scripts/repro_msm_pallas_2e21.py grid \
  > /tmp/repro_grid_r5.out 2> /tmp/repro_grid_r5.log
echo "grid rc=$?" >&2
cat /tmp/repro_grid_r5.out >&2

echo "=== repro n21 leg ===" >&2
timeout 7200 python scripts/repro_msm_pallas_2e21.py n21 \
  > /tmp/repro_n21_r5.out 2> /tmp/repro_n21_r5.log
echo "n21 rc=$?" >&2
cat /tmp/repro_n21_r5.out >&2

echo "=== headline zkevm batch 32 ===" >&2
{
  H2T_BV_PROFILE=1 timeout 10800 python bench.py 2>/tmp/bench_headline_r5.log
} > /tmp/bench_headline_r5.jsonl
cat /tmp/bench_headline_r5.jsonl >&2
grep "BV profile" /tmp/bench_headline_r5.log | tail -2 >&2

echo "=== batch scaling 4/8/16 ===" >&2
{
  for d in 1 2 4; do
    ZKEVM_DUP=$d H2T_BV_PROFILE=1 timeout 7200 python bench.py \
      2>/tmp/bench_scal_r5_$d.log \
      || echo "{\"error\": \"dup=$d rc=$?\"}"
  done
} > /tmp/bench_scaling_r5.jsonl
cat /tmp/bench_scaling_r5.jsonl >&2

echo "=== MSM sweep (signed A/B) ===" >&2
run_msm() { # size tag [env...]
  local SZ=$1; shift
  local TAG=$1; shift
  echo "--- MSM $SZ [$TAG] $* ---" >&2
  timeout 5400 env BENCH_MSM=1 BENCH_MSM_SIZE=$SZ BENCH_NO_FALLBACK=1 "$@" \
    python bench.py 2>/tmp/bench_msm_r5_${TAG}.log \
    || echo "{\"metric\": \"bn254_msm_points_per_sec\", \"size\": $SZ, \"tag\": \"$TAG\", \"error\": \"rc=$?\"}"
}
{
  run_msm 65536   s16_uns H2T_MSM_ACCUM=pallas H2T_MSM_SIGNED=0
  run_msm 65536   s16_sgn H2T_MSM_ACCUM=pallas H2T_MSM_SIGNED=1
  run_msm 1048576 s20_uns H2T_MSM_ACCUM=pallas H2T_MSM_SIGNED=0
  run_msm 1048576 s20_sgn H2T_MSM_ACCUM=pallas H2T_MSM_SIGNED=1
  run_msm 4194304 s22_uns H2T_MSM_ACCUM=pallas H2T_MSM_SIGNED=0
  run_msm 4194304 s22_sgn H2T_MSM_ACCUM=pallas H2T_MSM_SIGNED=1
} > /tmp/bench_msm_r5.jsonl
echo "QUEUE DONE" >&2
