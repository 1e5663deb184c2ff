#!/bin/bash
# Round-4 artifact queue. Run AFTER the headline rehearsal (one TPU process
# at a time!). Each leg appends a JSON row; partial results survive kills.
# Do NOT edit kernel/plan code while this runs.
set -u
cd /root/repo
R=${BENCH_ROUND:-04}

log() { echo "[bench_queue_r4] $(date +%H:%M:%S) $*" >&2; }

# --- 1. batch-scaling curve: proofs/s vs batch (fixtures make this cheap)
if [ ! -f BENCH_SCALING_r${R}.json ]; then
  log "batch scaling legs"
  rows=""
  for dup in 1 2 4 8; do
    out=$(ZKEVM_DUP=$dup timeout 3600 python bench.py 2>/tmp/bq4_scal_$dup.log)
    rc=$?
    log "dup=$dup rc=$rc: $out"
    [ $rc -eq 0 ] && rows="$rows{\"dup\": $dup, \"row\": $out},"
  done
  python - "$rows" <<'PY'
import json, sys
raw = sys.argv[1].rstrip(',')
rows = json.loads('[' + raw + ']') if raw else []
out = {
  "metric": "zkevm_batch_scaling_r04",
  "note": ("Headline workload (4 unique K=16 zkevm-shape proofs, fixtures) "
            "tiled x1/2/4/8 to batch 4/8/16/32: proofs/s vs batch on one "
            "v5e. Every lane runs full per-proof work; the curve is the "
            "TPU batching story."),
  "rows": rows,
}
with open("BENCH_SCALING_r04.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote BENCH_SCALING_r04.json", file=sys.stderr)
PY
fi

# --- 2. outer aggregation proof at k=21 (reference simple-example shape)
if [ ! -f BENCH_OUTER_r${R}.json ]; then
  log "outer proof k=21"
  out=$(BENCH_OUTER=1 OUTER_K=21 OUTER_NPROOFS=2 timeout 7200 python bench.py 2>/tmp/bq4_outer.log)
  rc=$?
  log "outer rc=$rc: $out"
  if [ $rc -eq 0 ]; then
    python - "$out" <<'PY'
import json, sys
row = json.loads(sys.argv[1])
out = {
  "metric": "outer_proof_r04",
  "note": ("Outer aggregation proof wall-clock at k=21 (2 inner proofs, "
            "TPU-accelerated prover, SHA transcript, native re-verify; "
            "reference analog simple-example.rs:361-363 needs k=22 for "
            "the same shape). vs_baseline is the 600s working target."),
  "rows": [row],
}
with open("BENCH_OUTER_r04.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote BENCH_OUTER_r04.json", file=sys.stderr)
PY
  fi
fi

# --- 3. MSM signed/unsigned sweep (NEW Mosaic variants: compiles first)
if [ ! -f BENCH_MSM_r${R}.json ]; then
  log "msm sweep"
  rows=""
  for leg in "16 0" "16 1" "20 1"; do
    set -- $leg; s=$1; sg=$2
    n=$((1 << s))
    out=$(BENCH_MSM=1 BENCH_MSM_SIZE=$n H2T_MSM_SIGNED=$sg timeout 7000 python bench.py 2>/tmp/bq4_msm_${s}_${sg}.log)
    rc=$?
    log "msm 2^$s signed=$sg rc=$rc: $out"
    [ $rc -eq 0 ] && rows="$rows{\"size_log2\": $s, \"signed\": $sg, \"row\": $out},"
  done
  python - "$rows" <<'PY'
import json, sys
raw = sys.argv[1].rstrip(',')
rows = json.loads('[' + raw + ']') if raw else []
out = {
  "metric": "bn254_msm_sweep_r04",
  "note": ("Round-4 MSM sweep on one v5e: Pallas fused kernels, signed "
            "(shifted-slot) vs unsigned bucket plans at 2^16/2^20, plus "
            "2^22 signed. vs_baseline = 1M pts/s working target."),
  "rows": rows,
}
with open("BENCH_MSM_r04.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote BENCH_MSM_r04.json", file=sys.stderr)
PY
fi

log "queue done"
