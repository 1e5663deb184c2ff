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


def test_packed_program_bit_exact(setup):
    """The packed-opcode encoding (solidity/packed.py, the reference D8
    update()-interpreter design) must reproduce (w_x, w_g) bit-exact from
    the same proof words as the direct statement interpreter."""
    from halo2_snark_aggregator_tpu.solidity.packed import encode, run_packed

    params, vk, circuit, proof = setup
    gen = generate(vk, params, proof, circuit.instances())
    assert gen.pairing_ok

    prog = encode(gen)
    words = proof_to_words(proof)
    flat_instances = [v % ff.R for col in circuit.instances() for v in col]

    # direct interpreter
    interp = Interpreter(gen.cg, words, flat_instances)
    interp.run()
    wx_direct = interp.point_of(gen.wx)
    wg_direct = interp.point_of(gen.wg)

    wx_packed, wg_packed = run_packed(prog, words, flat_instances)
    assert wx_packed == wx_direct
    assert wg_packed == wg_direct
    # and the pair satisfies the KZG pairing
    assert ff.pairing_check(
        [(wx_packed, params.s_g2), (wg_packed, ff.g2_neg(params.g2))])


def test_packed_contract_renders_and_is_well_formed(setup):
    """render_packed emits a structurally valid contract whose opcode blob
    stays ~7 B/statement (code-size headroom for k>=22 outer verifiers)."""
    from halo2_snark_aggregator_tpu.solidity.packed import encode
    from halo2_snark_aggregator_tpu.solidity.render import render, render_packed
    from halo2_snark_aggregator_tpu.solidity.syntax import check_solidity

    params, vk, circuit, proof = setup
    gen = generate(vk, params, proof, circuit.instances())
    src_packed = render_packed(gen, params)
    check_solidity(src_packed)
    assert "contract Verifier" in src_packed
    assert 'bytes constant OPS = hex"' in src_packed

    src_direct = render(gen, params)
    check_solidity(src_direct)

    prog = encode(gen)
    n_st = len(gen.cg.statements)
    assert len(prog.ops) <= 14 * n_st, (len(prog.ops), n_st)
    # the interpreter section is fixed-size; the per-statement growth is the
    # blob, far below direct statement text
    per_stmt_blob = len(prog.ops) / n_st
    assert per_stmt_blob < 12


def test_syntax_checker_catches_breakage(setup):
    from halo2_snark_aggregator_tpu.solidity.render import render_packed
    from halo2_snark_aggregator_tpu.solidity.syntax import (
        SoliditySyntaxError,
        check_solidity,
    )

    params, vk, circuit, proof = setup
    gen = generate(vk, params, proof, circuit.instances())
    src = render_packed(gen, params)
    import pytest as _pytest

    with _pytest.raises(SoliditySyntaxError):
        check_solidity(src.replace("contract Verifier {", "contract Verifier "))
    with _pytest.raises(SoliditySyntaxError):
        check_solidity(src.replace('hex"', 'hex"f', 1))


def test_keccak_transcript_roundtrip():
    """Keccak256 transcript flavor (reference codegen transcript
    ShaRead<Keccak256>, transcript/codegen.rs:19-37): prove under keccak,
    codegen, and round-trip both the direct interpreter and the packed
    executor; the rendered contracts use the native keccak256 opcode."""
    from halo2_snark_aggregator_tpu.solidity.packed import encode, run_packed
    from halo2_snark_aggregator_tpu.solidity.render import render, render_packed
    from halo2_snark_aggregator_tpu.solidity.syntax import check_solidity

    k = SimpleMulCircuit.K
    params = ParamsKZG.unsafe_setup(k)
    circuit = SimpleMulCircuit(5, 6)
    vk, pk = keygen(circuit, k, params)
    proof = create_proof(pk, params, [circuit], [circuit.instances()],
                         ShaWrite("keccak256"), seed=11)

    gen = generate(vk, params, proof, circuit.instances(), algo="keccak256")
    assert gen.pairing_ok
    words = proof_to_words(proof)
    flat = [v % ff.R for col in circuit.instances() for v in col]

    interp = Interpreter(gen.cg, words, flat, algo="keccak256")
    interp.run()
    wx = interp.point_of(gen.wx)
    wg = interp.point_of(gen.wg)
    assert ff.pairing_check([(wx, params.s_g2), (wg, ff.g2_neg(params.g2))])

    wx_p, wg_p = run_packed(encode(gen), words, flat, algo="keccak256")
    assert (wx_p, wg_p) == (wx, wg)

    for src in (render(gen, params), render_packed(gen, params)):
        check_solidity(src)
        assert "keccak256(buf)" in src
        assert "sha256(buf)" not in src
