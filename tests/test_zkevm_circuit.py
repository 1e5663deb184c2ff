"""zkEVM-shaped workload (reference A27 zkevm_test / C9): the wide
multi-phase, multi-lookup, rotation-bearing circuit family proves and
verifies end-to-end at a CPU-sized K; the same family scales to K>=16 for
TPU benches (api tests/systems/halo2/zkevm_test/verify_single.rs:30)."""

import pytest

from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
from halo2_snark_aggregator_tpu.circuits.zkevm import ZkevmShapeCircuit
from halo2_snark_aggregator_tpu.protocol import verify as pv
from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

K = 9
TABLE_BITS = 8
N_GROUPS = 4  # keep the CPU test quick; benches use the default width 8


def _circuit(seed):
    return ZkevmShapeCircuit(k=K, seed=seed, n_groups=N_GROUPS,
                             table_bits=TABLE_BITS)


def test_zkevm_shape_mock_satisfied():
    c = _circuit(seed=3)
    mp = MockProver(c, K, c.instances())
    mp.assert_satisfied()


@pytest.fixture(scope="module")
def setup():
    c = _circuit(seed=1)
    params = ParamsKZG.setup_cached(K)
    vk, pk = keygen(c, K, params)
    return params, vk, pk


def test_zkevm_shape_verifies_single(setup):
    params, vk, pk = setup
    c = _circuit(seed=5)
    proof = create_proof(pk, params, [c], [c.instances()], PoseidonWrite(),
                         seed=4)

    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = PoseidonTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="zkevm", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[c.instances()], transcript=t,
                             key="p0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    assert ok

    # wrong public input must fail
    ctx2 = ValueContext()
    pchip2 = ValueEccChip()
    nchip2 = schip2 = pchip2.scalar_chip
    t2 = PoseidonTranscriptRead(proof, ctx2, nchip2)
    bad = [[(c.instances()[0][0] + 1)]]
    cp2 = pv.CircuitProof(
        name="zkevm", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[bad], transcript=t2, key="p0")])
    *_, ok2 = pv.verify_single_proof_in_chip(ctx2, nchip2, schip2, pchip2, cp2)
    assert not ok2


def test_zkevm_shape_aggregates_two_proofs(setup):
    params, vk, pk = setup
    proofs, insts = [], []
    for seed in (7, 8):
        c = _circuit(seed=seed)
        proofs.append(create_proof(pk, params, [c], [c.instances()],
                                   PoseidonWrite(), seed=seed))
        insts.append(c.instances())

    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    pdata = [
        pv.ProofData(instances=[insts[i]],
                     transcript=PoseidonTranscriptRead(proofs[i], ctx, nchip),
                     key=f"p{i}")
        for i in range(2)
    ]
    agg_t = PoseidonTranscriptRead(b"", ctx, nchip)
    cp = pv.CircuitProof(name="zkevm", vk=vk, params=params, proofs=pdata)
    *_, commits, ok = pv.verify_aggregation_proofs_in_chip(
        ctx, nchip, schip, pchip, [cp], agg_t)
    assert ok
    assert len(commits) == 2


def test_zkevm_corrupted_z_fails(setup):
    """The RLC gate must actually constrain the phase-1 z column: a proof
    whose z witness is corrupted (all selectors honest) must NOT verify.
    Regression for the vacuous-gate bug where q_rlc/q_rlc_first were only
    assigned after the challenge check, committing all-zero selectors."""
    params, vk, pk = setup

    class BadZ(ZkevmShapeCircuit):
        def synthesize(self, config, assigner):
            super().synthesize(config, assigner)
            r = assigner.get_challenge(config.r)
            if r is not None and r != 1:  # only corrupt the real phase-1 pass
                assigner.assign_advice(config.z, 2, 0xDEAD)

    c = BadZ(k=K, seed=5, n_groups=N_GROUPS, table_bits=TABLE_BITS)
    try:
        proof = create_proof(pk, params, [c], [c.instances()], PoseidonWrite(),
                             seed=4)
    except ValueError:
        # the exact quotient division already rejects the unsatisfied gate —
        # with the vacuous selectors this proof was created (and verified)
        return
    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = PoseidonTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="zkevm", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[c.instances()], transcript=t,
                             key="p0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    assert not ok


def test_zkevm_infeasible_config_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="infeasible"):
        ZkevmShapeCircuit(k=8, seed=1, table_bits=8)
