"""K=18 EvmCircuit-scale leg (round-5 verdict #7): prove one zkevm-shape
proof at the reference's flagship inner size (K=18, 131 advice columns —
benches/zkevm_bench.rs:34 proves scroll's ~140-wide EvmCircuit at K=18),
verify it through the value-context engine, and report the aggregator-k
estimate from the reference's own rows heuristic (evaluation.rs:134-141,
32196 rows/ecmul).

Writes BENCH_ZKEVM18_r05.json. Run on the real chip (the accel prover
keygen+prove at 2^18 x 131 columns is a TPU job). The proof fixture
persists under bench_fixtures/ via bench._cached_zkevm_proofs, so the
batched-verify bench can replay it (ZKEVM_K=18 ZKEVM_GROUPS=43).
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(levelname)s %(message)s")

import bench  # noqa: E402

bench._configure_jax()

K = int(os.environ.get("ZKEVM_K", "18"))
GROUPS = int(os.environ.get("ZKEVM_GROUPS", "43"))

t0 = time.time()
params, vk, proofs = bench._cached_zkevm_proofs(K, 1, n_groups=GROUPS)
prove_s = time.time() - t0
proof, insts = proofs[0]
print(f"K={K} groups={GROUPS} proof ready in {prove_s:.1f}s "
      f"({len(proof)}B)", file=sys.stderr, flush=True)

# value-context verification (host oracle) + rows profile
from halo2_snark_aggregator_tpu.arith.value import (  # noqa: E402
    ValueContext, ValueEccChip,
)
from halo2_snark_aggregator_tpu.protocol import verify as pv  # noqa: E402
from halo2_snark_aggregator_tpu.protocol.evaluation import (  # noqa: E402
    print_points_profiling,
)
from halo2_snark_aggregator_tpu.protocol.transcript import (  # noqa: E402
    PoseidonTranscriptRead,
)

t1 = time.time()
ctx = ValueContext()
pchip = ValueEccChip()
nchip = schip = pchip.scalar_chip
cp = pv.CircuitProof(
    name="zkevm18", vk=vk, params=params,
    proofs=[pv.ProofData(instances=[insts],
                         transcript=PoseidonTranscriptRead(proof, ctx, nchip),
                         key="p0")])
*_rest, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
verify_s = time.time() - t1
assert ok, "K=18 proof failed the host pairing check"

# aggregator-k estimate (reference heuristic; the k the OUTER proof would
# need): total in-circuit ecmuls = the two final-MSM sizes the value context
# profiled (ctx.msm_sizes records each msm's entry count)
n_ecmul = sum(ctx.msm_sizes) if getattr(ctx, "msm_sizes", None) else 0
agg_k = print_points_profiling([f"zkevm18_{i}" for i in range(n_ecmul)])

result = {
    "metric": "zkevm18_inner_proof_seconds",
    "value": round(prove_s, 1),
    "unit": (f"s (zkevm-shape K={K}, {3 * GROUPS + 2} advice cols, accel "
             f"prover 1 chip; host verify {verify_s:.1f}s, pairing ok; "
             f"est. aggregator k={agg_k} by evaluation.rs heuristic)"),
    "vs_baseline": None,
}
print(json.dumps(result), flush=True)
with open("BENCH_ZKEVM18_r05.json", "w") as f:
    json.dump(result, f, indent=1)
print("wrote BENCH_ZKEVM18_r05.json", file=sys.stderr)
