"""Outer-proof stage tests.

CPU-runnable: the SHA256 transcript round trip (prove with ShaWrite, verify
through the context-generic ShaTranscriptRead — the reference's VerifyCheck
path, verify_circuit.rs:1032-1055) on a small circuit.

The full aggregator outer proof needs k=22 (in-circuit verifier rows) and
runs on real TPU hardware only — exercised via `python -m ...sdk.cli` /
BENCH_OUTER in bench.py, gated here behind RUN_OUTER=1.
"""

import os

import pytest

from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.protocol import verify as pv
from halo2_snark_aggregator_tpu.protocol.transcript import ShaTranscriptRead
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import ShaWrite


def test_sha_transcript_native_verify():
    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    c = SimpleMulCircuit(6, 7)
    vk, pk = keygen(c, k, params)
    proof = create_proof(pk, params, [c], [c.instances()], ShaWrite(), seed=1)

    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = ShaTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="simple", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[c.instances()], transcript=t, key="p0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    assert ok

    # negative: flipping a proof byte must fail (squeezed challenges shift)
    bad = bytearray(proof)
    bad[7] ^= 1
    ctx2 = ValueContext()
    pchip2 = ValueEccChip()
    nchip2 = schip2 = pchip2.scalar_chip
    t2 = ShaTranscriptRead(bytes(bad), ctx2, nchip2)
    cp2 = pv.CircuitProof(
        name="simple", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[c.instances()], transcript=t2, key="p0")])
    try:
        *_, ok2 = pv.verify_single_proof_in_chip(ctx2, nchip2, schip2, pchip2, cp2)
    except (ValueError, EOFError):
        ok2 = False
    assert not ok2


@pytest.mark.skipif(os.environ.get("RUN_OUTER") != "1",
                    reason="full outer proof needs k=22 on TPU (RUN_OUTER=1)")
def test_outer_pipeline_full():
    import tempfile

    from halo2_snark_aggregator_tpu.sdk import harness
    from halo2_snark_aggregator_tpu.sdk.cli import demo_spec
    from halo2_snark_aggregator_tpu.utils.store import FolderStore

    agg_k = int(os.environ.get("OUTER_K", "22"))
    with tempfile.TemporaryDirectory() as d:
        store = FolderStore(d)
        spec = demo_spec()
        harness.sample_setup(spec, store)
        harness.sample_run(spec, store)
        harness.verify_run([spec], store, agg_k=agg_k)
        assert harness.verify_check_outer(store, agg_k=agg_k)
