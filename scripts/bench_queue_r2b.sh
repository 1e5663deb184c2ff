#!/bin/bash
# Round-2 phase-B bench queue: runs AFTER bench_queue_r2.sh (pass its PID).
# Re-records the MSM sweep with the order-sharing + bounded-transfer fixes,
# A/Bs the pregather accumulate and window width on the real chip, and takes
# a per-stage profile of the headline batched verifier (cached proofs).
set -u
cd /root/repo

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (phase-A queue)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "phase-A queue done"
fi

run_msm() { # size, extra env..., logfile tag
  local SZ=$1; shift
  local TAG=$1; shift
  echo "=== MSM $SZ [$TAG] $* ==="
  timeout 5400 env BENCH_MSM=1 BENCH_MSM_SIZE=$SZ BENCH_NO_FALLBACK=1 "$@" \
    python bench.py 2>/tmp/bench_msm_${TAG}.log \
    || echo "{\"metric\": \"bn254_msm_points_per_sec\", \"size\": $SZ, \"tag\": \"$TAG\", \"error\": \"rc=$?\"}"
}

{
  run_msm 65536   s16_c8
  run_msm 65536   s16_c8_pre  H2T_MSM_PREFETCH=1
  run_msm 65536   s16_c10     BENCH_MSM_C=10
  run_msm 65536   s16_c12     BENCH_MSM_C=12
  run_msm 1048576 s20_c8
  run_msm 1048576 s20_c8_pre  H2T_MSM_PREFETCH=1
  run_msm 4194304 s22_c8
} > /tmp/bench_msm_ab.jsonl
cat /tmp/bench_msm_ab.jsonl

# canonical sweep artifact: default engine rows at 2^16/2^20/2^22
grep -v pre /tmp/bench_msm_ab.jsonl | grep -v c10 | grep -v c12 \
  > BENCH_MSM_r02.json
echo "BENCH_MSM_r02.json: $(cat BENCH_MSM_r02.json)"

echo "=== BV profile (batch 32, cached proofs) ==="
timeout 7200 env H2T_BV_PROFILE=1 BENCH_REPS=1 BENCH_NO_FALLBACK=1 \
  python bench.py > /tmp/bv_profile_out.json 2>/tmp/bv_profile.log \
  || echo "bv profile failed rc=$?"
grep "BV profile" /tmp/bv_profile.log || tail -3 /tmp/bv_profile.log
echo "PHASE-B QUEUE DONE"
