"""The synthetic large-circuit workload (C9/zkevm analog) proves and
verifies end-to-end at a CPU-sized K; the same family scales to K>=16 for
TPU benches."""

from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
from halo2_snark_aggregator_tpu.circuits.synthetic import SyntheticCircuit
from halo2_snark_aggregator_tpu.protocol import verify as pv
from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite


def test_synthetic_mock_satisfied():
    c = SyntheticCircuit(k=7, seed=3)
    mp = MockProver(c, 7, c.instances())
    mp.assert_satisfied()


def test_synthetic_proves_and_verifies():
    k = 8
    c = SyntheticCircuit(k=k, seed=5)
    params = ParamsKZG.setup_cached(k)
    vk, pk = keygen(c, k, params)
    proof = create_proof(pk, params, [c], [c.instances()], PoseidonWrite(), seed=4)

    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = PoseidonTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="synthetic", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[c.instances()], transcript=t, key="p0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    assert ok

    # wrong public input must fail
    ctx2 = ValueContext()
    pchip2 = ValueEccChip()
    nchip2 = schip2 = pchip2.scalar_chip
    t2 = PoseidonTranscriptRead(proof, ctx2, nchip2)
    bad = [[(c.instances()[0][0] + 1)]]
    cp2 = pv.CircuitProof(
        name="synthetic", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[bad], transcript=t2, key="p0")])
    *_, ok2 = pv.verify_single_proof_in_chip(ctx2, nchip2, schip2, pchip2, cp2)
    assert not ok2
