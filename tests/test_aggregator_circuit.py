"""Aggregator-circuit integration test (reference C8,
halo2-snark-aggregator-circuit/src/tests/mul_add.rs:100-209: the SAME
protocol engine that verifies on values synthesizes a satisfiable aggregation
circuit inside a MockProver at K=22 over a real generated proof).

The value context is the oracle: the circuit's public-input vector is
computed by the value-context run (calc_verify_circuit_final_pair) and the
in-circuit packing must equality-match it cell by cell."""

import pytest

from halo2_snark_aggregator_tpu.circuits.aggregator import (
    AggregatorCircuit, SingleProofWitness, VerifierCircuitTarget)
from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.protocol.instances import unpack_point
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

AGG_K = 22  # circuit/src/tests/mul_add.rs:181


@pytest.fixture(scope="module")
def inner_proof():
    params = ParamsKZG.setup_cached(SimpleMulCircuit.K)
    c = SimpleMulCircuit(3, 5)
    vk, pk = keygen(c, SimpleMulCircuit.K, params)
    proof = create_proof(pk, params, [c], [c.instances()], PoseidonWrite(), seed=0)
    return params, c, vk, proof


def test_aggregator_circuit_mock_prover(inner_proof):
    params, c, vk, proof = inner_proof
    target = VerifierCircuitTarget(
        name="simple", vk=vk, params=params,
        proofs=[SingleProofWitness(instances=c.instances(), transcript=proof)])
    agg = AggregatorCircuit([target])

    instances = agg.instances()
    # the instance vector is the packed final pair + the inner public input
    assert len(instances[0]) == 5
    assert instances[0][4] == c.public_output()
    # packing round-trips through the host unpacker onto the value-context pair
    w_x, w_g, _plain = agg.calc_final_pair()
    assert unpack_point(instances[0][0:2]) == w_x
    assert unpack_point(instances[0][2:4]) == w_g

    mp = MockProver(agg, AGG_K, instances)
    assert agg.row_usage["base"] < (1 << AGG_K)
    mp.assert_satisfied()

    # negative: a tampered public input breaks the instance equality copies
    mp.assignment.instances[0][4] = (mp.assignment.instances[0][4] + 1)
    mp._col_cache.clear()
    failures = mp.verify()
    assert any(f.kind == "copy" for f in failures)


def test_aggregator_circuit_lookup_target():
    """In-circuit aggregation of a LOOKUP-bearing target proof (reference C8
    tests/lookup.rs analog). This is the gadget path the second recursion
    layer leans on: a layer-1 aggregator vk carries 4 range lookups."""
    from halo2_snark_aggregator_tpu.circuits.lookup import SimpleLookupCircuit

    k = SimpleLookupCircuit.K
    params = ParamsKZG.setup_cached(k)
    c = SimpleLookupCircuit([1, 3, 5, 7, 11, 13, 15])
    vk, pk = keygen(c, k, params)
    proof = create_proof(pk, params, [c], [c.instances()], PoseidonWrite(), seed=3)
    target = VerifierCircuitTarget(
        name="lookup", vk=vk, params=params,
        proofs=[SingleProofWitness(instances=c.instances(), transcript=proof)])
    agg = AggregatorCircuit([target])
    instances = agg.instances()
    mp = MockProver(agg, AGG_K, instances)
    assert agg.row_usage["base"] < (1 << AGG_K)
    mp.assert_satisfied()
