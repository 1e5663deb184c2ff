"""Multi-phase (challenge) proving end to end via the shuffle circuit:
phase-1 advice witness depends on a squeezed challenge (reference
sdk/examples/shuffle.rs workload; verifier multi-phase replay
verify.rs:350-391)."""

import pytest

from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
from halo2_snark_aggregator_tpu.circuits.shuffle import ShuffleCircuit
from halo2_snark_aggregator_tpu.protocol import verify as pv
from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite


@pytest.fixture(scope="module")
def setup():
    k = ShuffleCircuit.K
    params = ParamsKZG.setup_cached(k)
    c = ShuffleCircuit()
    vk, pk = keygen(c, k, params)
    return params, c, vk, pk


def _verify(vk, params, c, proof) -> bool:
    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = PoseidonTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="shuffle", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[c.instances()], transcript=t, key="p0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    return ok


def test_shuffle_proves_and_verifies(setup):
    params, c, vk, pk = setup
    proof = create_proof(pk, params, [c], [c.instances()], PoseidonWrite(), seed=2)
    assert _verify(vk, params, c, proof)


def test_shuffle_rejects_non_permutation(setup):
    params, c, vk, pk = setup
    bad = ShuffleCircuit()
    bad.shuffled = list(bad.shuffled)
    bad.shuffled[0] = (bad.shuffled[0] + 1) % 97
    # z no longer telescopes to 1 -> the quotient numerator is not divisible
    # by X^n - 1 and the honest prover must refuse
    with pytest.raises(ValueError):
        create_proof(pk, params, [bad], [bad.instances()], PoseidonWrite(), seed=2)


def test_shuffle_accel_bit_exact(setup):
    """Multi-phase path parity between the host and accelerated provers."""
    from halo2_snark_aggregator_tpu.prover import accel

    params, c, vk, pk = setup
    host_proof = create_proof(pk, params, [c], [c.instances()],
                              PoseidonWrite(), seed=5)
    apk = accel.AccelPk.from_host(pk)
    aparams = accel.AccelParams.from_params(params)
    accel_proof = accel.create_proof_accel(
        apk, aparams, [c], [c.instances()], PoseidonWrite(), seed=5)
    assert accel_proof == host_proof
    assert _verify(vk, params, c, host_proof)
