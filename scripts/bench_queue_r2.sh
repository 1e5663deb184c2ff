#!/bin/bash
# Round-2 bench queue: runs the VERDICT-mandated recorded benches strictly
# sequentially (ONE TPU process at a time — CLAUDE.md), each step isolated so
# a TPU worker fault doesn't lose the rest. Artifacts land at the repo root.
set -u
cd /root/repo

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (running bench) to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "pid $WAIT_PID exited"
  # record the headline run's JSON line (default bench_zkevm_batched)
  if [ -s /tmp/bench_r2_out.json ]; then
    cp /tmp/bench_r2_out.json BENCH_ZKEVM_r02.json
    echo "headline: $(cat BENCH_ZKEVM_r02.json)"
  fi
fi

# --- MSM throughput sweep (BASELINE.md axis 2; VERDICT next-step #3) -------
: > /tmp/bench_msm_sweep.json
for SZ in 65536 1048576 4194304; do
  echo "=== BENCH_MSM size $SZ ==="
  timeout 5400 env BENCH_MSM=1 BENCH_MSM_SIZE=$SZ BENCH_NO_FALLBACK=1 \
    python bench.py >> /tmp/bench_msm_sweep.json 2>/tmp/bench_msm_$SZ.log \
    || echo "{\"metric\": \"bn254_msm_points_per_sec\", \"size\": $SZ, \"error\": \"rc=$?\"}" >> /tmp/bench_msm_sweep.json
  tail -2 /tmp/bench_msm_$SZ.log
done
cp /tmp/bench_msm_sweep.json BENCH_MSM_r02.json
echo "msm sweep done: $(cat BENCH_MSM_r02.json)"

# --- outer aggregation proof at reference scale (VERDICT next-step #4) ------
echo "=== BENCH_OUTER k=21 nproofs=2 ==="
timeout 21600 env BENCH_OUTER=1 OUTER_K=21 OUTER_NPROOFS=2 \
  OUTER_FOLDER=/tmp/bench_outer_k21 BENCH_NO_FALLBACK=1 \
  python bench.py > /tmp/bench_outer_out.json 2>/tmp/bench_outer.log \
  || echo "{\"metric\": \"outer_proof_seconds\", \"error\": \"rc=$?\"}" > /tmp/bench_outer_out.json
cp /tmp/bench_outer_out.json BENCH_OUTER_r02.json
echo "outer done: $(cat BENCH_OUTER_r02.json)"

# --- multihost scaling curve on the virtual CPU mesh (VERDICT #9) -----------
echo "=== multihost scaling (CPU) ==="
timeout 7200 python scripts/bench_multihost_scaling.py \
  > /tmp/mh_scaling_out.json 2>/tmp/mh_scaling.log \
  || echo "scaling failed rc=$?"
tail -3 /tmp/mh_scaling.log | grep -v cpu_aot_loader || true
echo "QUEUE DONE"
