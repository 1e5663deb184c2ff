"""End-to-end over the lookup argument (reference lookup_test analog)."""

import pytest

from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
from halo2_snark_aggregator_tpu.circuits.lookup import SimpleLookupCircuit
from halo2_snark_aggregator_tpu.protocol import verify as pv
from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite


@pytest.fixture(scope="module")
def setup():
    k = SimpleLookupCircuit.K
    params = ParamsKZG.unsafe_setup(k)
    circuit = SimpleLookupCircuit()
    vk, pk = keygen(circuit, k, params)
    return params, vk, pk


def test_lookup_proof_verifies(setup):
    params, vk, pk = setup
    circuit = SimpleLookupCircuit([2, 4, 6, 8])
    proof = create_proof(pk, params, [circuit], [[]], PoseidonWrite(), seed=9)

    ctx = ValueContext()
    pchip = ValueEccChip()
    schip = nchip = pchip.scalar_chip
    transcript = PoseidonTranscriptRead(proof, ctx, nchip)
    circuit_proof = pv.CircuitProof(
        name="lookup", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[[]], transcript=transcript, key="p0")],
    )
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, circuit_proof)
    assert ok
    assert transcript.at_end()


def test_lookup_prover_rejects_out_of_table():
    # witness outside the table must make proving fail (permute_expression_pair
    # errors exactly like halo2's ConstraintSystemFailure)
    k = SimpleLookupCircuit.K
    params = ParamsKZG.unsafe_setup(k)
    circuit = SimpleLookupCircuit()
    vk, pk = keygen(circuit, k, params)
    bad = SimpleLookupCircuit()
    bad.values = [99]  # bypass constructor check; 99 not in table
    with pytest.raises(ValueError):
        create_proof(pk, params, [bad], [[]], PoseidonWrite(), seed=10)
