"""Codegen-context end-to-end: generate the EVM verifier IR for a real
SHA-transcript proof and execute it with the EVM-semantics interpreter; the
reproduced (w_x, w_g) must satisfy the KZG pairing (reference D7/D9 pipeline,
validated without a Solidity toolchain)."""

import pytest

from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.solidity.generate import generate
from halo2_snark_aggregator_tpu.solidity.interpreter import Interpreter, proof_to_words
from halo2_snark_aggregator_tpu.transcript.host import ShaWrite


@pytest.fixture(scope="module")
def setup():
    k = SimpleMulCircuit.K
    params = ParamsKZG.unsafe_setup(k)
    circuit = SimpleMulCircuit(3, 4)
    vk, pk = keygen(circuit, k, params)
    proof = create_proof(pk, params, [circuit], [circuit.instances()],
                         ShaWrite("sha256"), seed=7)
    return params, vk, circuit, proof


def test_codegen_and_interpret(setup):
    params, vk, circuit, proof = setup
    instances = circuit.instances()
    gen = generate(vk, params, proof, instances)
    assert gen.pairing_ok, "sampled-value pairing failed"

    interp = Interpreter(
        gen.cg,
        proof_to_words(proof),
        [v % ff.R for col in instances for v in col],
    )
    interp.run()
    wx = interp.point_of(gen.wx)
    wg = interp.point_of(gen.wg)
    # interpreter must reproduce the sampled points bit-exactly
    assert wx == gen.wx.v and wg == gen.wg.v
    # and the pair must satisfy e(wx, s g2) * e(wg, -g2) == 1
    assert ff.pairing_check([(wx, params.s_g2), (wg, ff.g2_neg(params.g2))])


def test_codegen_rejects_wrong_instance(setup):
    params, vk, circuit, proof = setup
    instances = circuit.instances()
    gen = generate(vk, params, proof, instances)
    bad = [(instances[0][0] + 1) % ff.R]
    interp = Interpreter(gen.cg, proof_to_words(proof), bad)
    interp.run()
    wx = interp.point_of(gen.wx)
    wg = interp.point_of(gen.wg)
    assert not ff.pairing_check([(wx, params.s_g2), (wg, ff.g2_neg(params.g2))])


def test_render_and_memory_allocation(setup):
    from halo2_snark_aggregator_tpu.solidity.linear_scan import allocate_slots
    from halo2_snark_aggregator_tpu.solidity.render import render

    params, vk, circuit, proof = setup
    gen = generate(vk, params, proof, circuit.instances())
    n_ssa = sum(len(st.dest) for st in gen.cg.statements)
    _slots, total = allocate_slots(gen.cg)
    # linear scan must reuse slots substantially
    assert total < n_ssa / 2, (total, n_ssa)

    src = render(gen, params)
    assert "contract Verifier" in src
    assert "pairing_check" in src
    assert "sha256(buf)" in src
    assert f"proof.length == {gen.transcript_words}" in src


def test_group_optimizers_fire_and_preserve_semantics(setup):
    """D5 passes (solidity/aggregate.py) must compress the statement list and
    leave the interpreted (w_x, w_g) unchanged, with loops in the source."""
    from halo2_snark_aggregator_tpu.solidity import aggregate
    from halo2_snark_aggregator_tpu.solidity.chips import (SolidityEccChip)
    from halo2_snark_aggregator_tpu.solidity.render import render

    params, vk, circuit, proof = setup
    gen = generate(vk, params, proof, circuit.instances())
    ops = [st.op for st in gen.cg.statements]
    assert "hash_points_run" in ops, "UpdateHashMerger analog found no runs"
    assert ("fr_horner_pm" in ops or "fr_dot_mt" in ops), \
        "no packed mul-add chains found"

    interp = Interpreter(gen.cg, proof_to_words(proof),
                         [v % ff.R for col in circuit.instances() for v in col])
    interp.run()
    assert interp.point_of(gen.wx) == gen.wx.v
    assert interp.point_of(gen.wg) == gen.wg.v

    src = render(gen, params)
    assert "for (uint256 i = 0;" in src


def test_pack16_unit():
    from halo2_snark_aggregator_tpu.solidity.aggregate import _pack16
    w = _pack16([1, 0xFFFF, 7])
    assert (w & 0xFFFF) == 1
    assert ((w >> 16) & 0xFFFF) == 0xFFFF
    assert ((w >> 32) & 0xFFFF) == 7


def test_peephole_fused_and_still_correct(setup):
    params, vk, circuit, proof = setup
    gen = generate(vk, params, proof, circuit.instances())
    ops = [st.op for st in gen.cg.statements]
    assert "fr_mul_add" in ops or "fr_mul_sub" in ops, "peephole found nothing"
    interp = Interpreter(gen.cg, proof_to_words(proof),
                         [v % ff.R for col in circuit.instances() for v in col])
    interp.run()
    assert interp.point_of(gen.wx) == gen.wx.v
    assert interp.point_of(gen.wg) == gen.wg.v
