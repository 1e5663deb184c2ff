"""Batched on-device verifier vs the value-context aggregation oracle."""

import pytest

from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.protocol import verify as pv
from halo2_snark_aggregator_tpu.protocol.batched import BatchedVerifier
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
    proofs, insts = [], []
    for i, (a, b) in enumerate([(2, 3), (5, 7)]):
        c = SimpleMulCircuit(a, b)
        proofs.append(create_proof(pk, params, [c], [c.instances()],
                                   PoseidonWrite(), seed=20 + i))
        insts.append(c.instances())
    return params, vk, proofs, insts


def _oracle(params, vk, proofs, insts):
    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    pdata = [
        pv.ProofData(instances=[inst], transcript=PoseidonTranscriptRead(p, ctx, nchip),
                     key=f"p{i}")
        for i, (p, inst) in enumerate(zip(proofs, insts))
    ]
    agg = PoseidonTranscriptRead(b"", ctx, nchip)
    cp = pv.CircuitProof(name="s", vk=vk, params=params, proofs=pdata)
    w_x, w_g, *_rest, ok = pv.verify_aggregation_proofs_in_chip(
        ctx, nchip, schip, pchip, [cp], agg
    )
    assert ok
    return w_x, w_g


def test_batched_matches_oracle(setup):
    params, vk, proofs, insts = setup
    expected_wx, expected_wg = _oracle(params, vk, proofs, insts)

    bv = BatchedVerifier(vk, params, batch=2, sample_proof=proofs[0],
                         sample_instances=insts[0], msm_window=8)
    w_x, w_g, ok = bv.verify(proofs, [[col for col in inst] for inst in insts])
    assert ok, "batched pairing failed"
    assert w_x == expected_wx
    assert w_g == expected_wg


def test_batched_rejects_bad_instance(setup):
    params, vk, proofs, insts = setup
    bv = BatchedVerifier(vk, params, batch=2, sample_proof=proofs[0],
                         sample_instances=insts[0])
    bad = [list(map(list, inst)) for inst in insts]
    bad[1][0][0] = (bad[1][0][0] + 1) % (2**64)
    *_pair, ok = bv.verify(proofs, bad)
    assert not ok


def test_batched_sharded_matches_oracle(setup):
    """Mesh-sharded phase B2 (8-device CPU mesh) is bit-identical to the
    single-device batched verifier and the value oracle."""
    from halo2_snark_aggregator_tpu.parallel.msm_shard import make_mesh

    params, vk, proofs, insts = setup
    expected_wx, expected_wg = _oracle(params, vk, proofs, insts)

    mesh = make_mesh(8)
    bv = BatchedVerifier(vk, params, batch=2, sample_proof=proofs[0],
                         sample_instances=insts[0], msm_window=8, mesh=mesh)
    w_x, w_g, ok = bv.verify(proofs, insts)
    assert ok, "sharded batched pairing failed"
    assert w_x == expected_wx
    assert w_g == expected_wg


def test_batched_zkevm_shape():
    """The traced batched verifier over the multi-phase, multi-lookup
    zkevm-shape circuit (the default bench.py workload): phase-1 challenge
    replay and the wider MSM manifest must survive the tape compilation."""
    from halo2_snark_aggregator_tpu.circuits.zkevm import ZkevmShapeCircuit
    from halo2_snark_aggregator_tpu.protocol.batched import BatchedVerifier
    from halo2_snark_aggregator_tpu.prover.keygen import keygen
    from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
    from halo2_snark_aggregator_tpu.prover.prove import create_proof
    from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

    k, n_groups, batch = 9, 4, 3
    params = ParamsKZG.setup_cached(k)
    c0 = ZkevmShapeCircuit(k=k, seed=1, n_groups=n_groups)
    vk, pk = keygen(c0, k, params)
    proofs, insts = [], []
    for i in range(batch):
        c = ZkevmShapeCircuit(k=k, seed=4 + i, n_groups=n_groups)
        proofs.append(create_proof(pk, params, [c], [c.instances()],
                                   PoseidonWrite(), seed=i))
        insts.append(c.instances())

    bv = BatchedVerifier(vk, params, batch=batch, sample_proof=proofs[0],
                         sample_instances=insts[0], msm_window=4)
    *_pair, ok = bv.verify(proofs, insts)
    assert ok

    bad = [list(col) for col in insts[1]]
    bad[0][0] = (bad[0][0] + 1) % (1 << 64)
    *_pair, ok2 = bv.verify(proofs, [insts[0], bad, insts[2]])
    assert not ok2
