"""On-chip smoke test: BatchedVerifier phase-B via the Pallas MSM kernels.

Proves a few SimpleMulCircuit proofs (tiny K), then verifies the batch twice
on the real chip — once with msm_impl='scan' (XLA seg-scan reference path)
and once with msm_impl='pallas' — and asserts both agree on (w_x, w_g, ok).
CPU-interpret Mosaic is impractical to compile, so this is the kernel-path
correctness arbiter (same role as scripts/smoke_msm_pallas_tpu.py for the
staged MSM).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.protocol.batched import BatchedVerifier
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

nproofs = int(os.environ.get("SMOKE_NPROOFS", "4"))
k = SimpleMulCircuit.K
params = ParamsKZG.setup_cached(k)
circuit = SimpleMulCircuit(2, 3)
vk, pk = keygen(circuit, k, params)
proofs, insts = [], []
for i in range(nproofs):
    c = SimpleMulCircuit(2 + i, 3 + i)
    proofs.append(create_proof(pk, params, [c], [c.instances()],
                               PoseidonWrite(), seed=i))
    insts.append(c.instances())
print(f"proved {nproofs} sample proofs", file=sys.stderr)

results = {}
for impl in ("scan", "pallas"):
    t0 = time.time()
    bv = BatchedVerifier(vk, params, batch=nproofs, sample_proof=proofs[0],
                         sample_instances=insts[0], msm_impl=impl)
    t1 = time.time()
    w_x, w_g, ok = bv.verify(proofs, insts)
    t2 = time.time()
    assert ok, f"verify failed under msm_impl={impl}"
    w_x2, w_g2, ok2 = bv.verify(proofs, insts)
    t3 = time.time()
    assert ok2 and w_x2 == w_x and w_g2 == w_g
    results[impl] = (w_x, w_g)
    print(f"{impl}: build {t1-t0:.1f}s, verify1 {t2-t1:.1f}s (compiles), "
          f"verify2 {t3-t2:.2f}s -> ok", file=sys.stderr)

assert results["scan"] == results["pallas"], (
    "scan/pallas phase-B disagree", results)
print("SMOKE OK: pallas phase-B bit-identical to scan path", file=sys.stderr)
