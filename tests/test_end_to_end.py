"""End-to-end: prove with the native prover, verify with the protocol engine
(value context), final KZG pairing check must pass.

This is the oracle-path analog of the reference's
test_verify_single_proof_in_chip / test_verify_aggregation_proof_in_chip
(api/src/tests/systems/halo2/add_mul_test/*, SURVEY §3.5).
"""

import pytest

from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.protocol import verify as pv
from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite


@pytest.fixture(scope="module")
def setup():
    k = SimpleMulCircuit.K
    params = ParamsKZG.unsafe_setup(k)
    circuit = SimpleMulCircuit(2, 3)
    vk, pk = keygen(circuit, k, params)
    return params, vk, pk


def _prove(pk, params, a, b, seed):
    circuit = SimpleMulCircuit(a, b)
    return (
        create_proof(pk, params, [circuit], [circuit.instances()],
                     PoseidonWrite(), seed=seed),
        circuit.instances(),
    )


def test_verify_single_proof(setup):
    params, vk, pk = setup
    proof, instances = _prove(pk, params, 2, 3, seed=1)

    ctx = ValueContext()
    pchip = ValueEccChip()
    schip = nchip = pchip.scalar_chip
    transcript = PoseidonTranscriptRead(proof, ctx, nchip)
    circuit_proof = pv.CircuitProof(
        name="simple", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[instances], transcript=transcript, key="p0")],
    )
    w_x, w_g, plain, advice, ok = pv.verify_single_proof_in_chip(
        ctx, nchip, schip, pchip, circuit_proof
    )
    assert ok, "pairing check failed"
    assert transcript.at_end()
    assert plain[0] == instances[0][0]


def test_verify_rejects_wrong_instance(setup):
    params, vk, pk = setup
    proof, instances = _prove(pk, params, 2, 3, seed=2)
    bad_instances = [[instances[0][0] + 1]]

    ctx = ValueContext()
    pchip = ValueEccChip()
    schip = nchip = pchip.scalar_chip
    transcript = PoseidonTranscriptRead(proof, ctx, nchip)
    circuit_proof = pv.CircuitProof(
        name="simple", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[bad_instances], transcript=transcript, key="p0")],
    )
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, circuit_proof)
    assert not ok


def test_verify_rejects_tampered_proof(setup):
    params, vk, pk = setup
    proof, instances = _prove(pk, params, 2, 3, seed=3)
    tampered = bytearray(proof)
    tampered[64] ^= 1  # flip a bit in some commitment/scalar
    ctx = ValueContext()
    pchip = ValueEccChip()
    schip = nchip = pchip.scalar_chip
    try:
        transcript = PoseidonTranscriptRead(bytes(tampered), ctx, nchip)
        circuit_proof = pv.CircuitProof(
            name="simple", vk=vk, params=params,
            proofs=[pv.ProofData(instances=[instances], transcript=transcript, key="p0")],
        )
        *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, circuit_proof)
    except (ValueError, EOFError):
        return  # malformed encoding is also a rejection
    assert not ok


def test_verify_aggregation_two_proofs(setup):
    params, vk, pk = setup
    proof1, inst1 = _prove(pk, params, 2, 3, seed=4)
    proof2, inst2 = _prove(pk, params, 5, 7, seed=5)

    ctx = ValueContext()
    pchip = ValueEccChip()
    schip = nchip = pchip.scalar_chip
    t1 = PoseidonTranscriptRead(proof1, ctx, nchip)
    t2 = PoseidonTranscriptRead(proof2, ctx, nchip)
    agg_transcript = PoseidonTranscriptRead(b"", ctx, nchip)
    circuit_proof = pv.CircuitProof(
        name="simple", vk=vk, params=params,
        proofs=[
            pv.ProofData(instances=[inst1], transcript=t1, key="c0_p0"),
            pv.ProofData(instances=[inst2], transcript=t2, key="c0_p1"),
        ],
    )
    w_x, w_g, plain, commits, ok = pv.verify_aggregation_proofs_in_chip(
        ctx, nchip, schip, pchip, [circuit_proof], agg_transcript
    )
    assert ok, "aggregated pairing check failed"
    assert len(commits) == 2
    assert len(ctx.msm_sizes) >= 1


def test_aggregation_rejects_duplicate_keys(setup):
    params, vk, pk = setup
    proof1, inst1 = _prove(pk, params, 2, 3, seed=11)
    proof2, inst2 = _prove(pk, params, 4, 5, seed=12)
    ctx = ValueContext()
    pchip = ValueEccChip()
    schip = nchip = pchip.scalar_chip
    t1 = PoseidonTranscriptRead(proof1, ctx, nchip)
    t2 = PoseidonTranscriptRead(proof2, ctx, nchip)
    agg = PoseidonTranscriptRead(b"", ctx, nchip)
    cp = pv.CircuitProof(
        name="simple", vk=vk, params=params,
        proofs=[
            pv.ProofData(instances=[inst1], transcript=t1, key="same"),
            pv.ProofData(instances=[inst2], transcript=t2, key="same"),
        ],
    )
    # duplicate keys would silently corrupt the schema key-dedup; must assert
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        pv.verify_aggregation_proofs_in_chip(ctx, nchip, schip, pchip, [cp], agg)
