#!/bin/bash
# Round-3 MSM sweep for the record: the Pallas-accumulate default at
# 2^16 / 2^20 / 2^22 (BASELINE.md demands the full range; round 2's 2^22
# leg died rc=143), plus the XLA pregather A/B legs at each size so the
# kernel's win is a recorded number, not a claim. Every leg pins its knobs.
set -u
cd /root/repo

run_msm() { # size tag [env...]
  local SZ=$1; shift
  local TAG=$1; shift
  echo "=== MSM $SZ [$TAG] $* ===" >&2
  timeout 3600 env BENCH_MSM=1 BENCH_MSM_SIZE=$SZ BENCH_NO_FALLBACK=1 "$@" \
    python bench.py 2>/tmp/bench_msm_${TAG}.log \
    || echo "{\"metric\": \"bn254_msm_points_per_sec\", \"size\": $SZ, \"tag\": \"$TAG\", \"error\": \"rc=$?\"}"
}

{
  run_msm 65536   s16_pallas H2T_MSM_ACCUM=pallas
  run_msm 65536   s16_pre    H2T_MSM_ACCUM=pre
  run_msm 1048576 s20_pallas H2T_MSM_ACCUM=pallas
  run_msm 1048576 s20_pre    H2T_MSM_ACCUM=pre
  run_msm 4194304 s22_pallas H2T_MSM_ACCUM=pallas
} > /tmp/bench_msm_sweep_r3.jsonl
echo "SWEEP DONE" >&2
cat /tmp/bench_msm_sweep_r3.jsonl >&2
