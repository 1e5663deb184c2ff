"""halo2-compat pinned-vk digest (protocol/pinned_compat.py).

Pins the reconstructed `{:?}` grammar structurally (hand-written expected
fragments, NOT produced by the code under test), re-runs the per-field
injectivity sweep under the compat serialization, and round-trips a real
proof end-to-end with H2T_VK_DIGEST=halo2-pinned (prover and verifier both
route the digest through VerifyingKey.transcript_repr)."""

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.protocol.pinned_compat import (
    pinned_vk_debug_str,
    transcript_repr_compat,
)
from halo2_snark_aggregator_tpu.prover.domain import omega_for_k

from test_vk_digest import _base_vk, _mutants


def test_pinned_grammar_fragments():
    vk = _base_vk()
    s = pinned_vk_debug_str(vk)

    assert s.startswith(
        'PinnedVerificationKey { base_modulus: '
        '"0x30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47", '
        'scalar_modulus: '
        '"0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001", '
        'domain: PinnedEvaluationDomain { k: 5, extended_k: '
    )
    # omega for k=5: 7^((r-1)/2^5), rendered as 0x + 64 lowercase hex
    omega = pow(7, (ff.R - 1) >> 5, ff.R)
    assert omega_for_k(5) == omega
    assert f"omega: 0x{omega:064x} }}" in s

    # gate: f * (a*b - a) with query indices (advice a=q0 rot0, b=q1 rot1)
    a0 = "Advice { query_index: 0, column_index: 0, rotation: Rotation(0) }"
    a1 = "Advice { query_index: 1, column_index: 1, rotation: Rotation(1) }"
    f0 = "Fixed { query_index: 0, column_index: 0, rotation: Rotation(0) }"
    assert (f"gates: [Product({f0}, Sum(Product({a0}, {a1}), "
            f"Negated({a0})))]") in s
    assert (f"advice_queries: [(Column {{ index: 0, column_type: Advice }}, "
            f"Rotation(0)), (Column {{ index: 1, column_type: Advice }}, "
            f"Rotation(1))]") in s
    assert ("fixed_queries: [(Column { index: 0, column_type: Fixed }, "
            "Rotation(0))]") in s
    assert ("permutation: Argument { columns: ["
            "Column { index: 0, column_type: Advice }, "
            "Column { index: 0, column_type: Instance }] }") in s
    assert (f"lookups: [Argument {{ input_expressions: [{a0}], "
            f"table_expressions: [{f0}] }}]") in s
    # the base vk squeezes one phase-0 challenge -> challenge fields present
    assert ("num_selectors: 0, num_challenges: 1, "
            "advice_column_phase: [Phase(0), Phase(1)], "
            "challenge_phase: [Phase(0)], gates:") in s
    # G1 generator commitment rendered halo2curves-style
    g = f"(0x{1:064x}, 0x{2:064x})"
    assert f"fixed_commitments: [{g}]" in s
    assert s.endswith("] } }")
    assert "minimum_degree: None" in s


def test_phase0_circuit_matches_020_layout():
    """A challenge-free vk must NOT render the multi-phase fields (0.2.0
    digest stability for plain circuits)."""
    vk = _base_vk()
    vk.cs.num_challenges = 0
    vk.cs.challenge_phase = []
    s = pinned_vk_debug_str(vk)
    assert "num_challenges" not in s
    assert "advice_column_phase" not in s
    assert "num_selectors: 0, gates:" in s


def test_compat_digest_injective_per_field():
    vk = _base_vk()
    base = transcript_repr_compat(vk)
    assert base != vk.transcript_repr()  # styles differ
    digests = {"<base>": base}
    for name, mutant in _mutants(vk).items():
        if name == "num_challenges":
            # bumping the count without a matching phase entry is not a
            # reachable CS state; keep phases consistent for the compat sweep
            mutant.cs.challenge_phase.append(0)
        d = transcript_repr_compat(mutant)
        assert d != base, f"compat digest ignores field {name!r}"
        digests[name] = d
    assert len(set(digests.values())) == len(digests)


def test_end_to_end_roundtrip_halo2_style(monkeypatch):
    """Prove + verify a real circuit with the compat digest enabled: both
    sides absorb the same reconstructed pinned digest, and the pairing check
    still passes (and fails for a corrupted proof)."""
    monkeypatch.setenv("H2T_VK_DIGEST", "halo2-pinned")

    from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
    from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
    from halo2_snark_aggregator_tpu.protocol import verify as pv
    from halo2_snark_aggregator_tpu.protocol.transcript import (
        PoseidonTranscriptRead,
    )
    from halo2_snark_aggregator_tpu.prover.keygen import keygen
    from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
    from halo2_snark_aggregator_tpu.prover.prove import create_proof
    from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    circuit = SimpleMulCircuit(2, 3)
    vk, pk = keygen(circuit, k, params)

    proof = create_proof(pk, params, [circuit], [circuit.instances()],
                         PoseidonWrite(), seed=11)

    def verify(proof_bytes):
        ctx = ValueContext()
        pchip = ValueEccChip()
        nchip = schip = pchip.scalar_chip
        t = PoseidonTranscriptRead(proof_bytes, ctx, nchip)
        pdata = [pv.ProofData(instances=[circuit.instances()], transcript=t,
                              key="p0")]
        agg_t = PoseidonTranscriptRead(b"", ctx, nchip)
        cp = pv.CircuitProof(name="compat", vk=vk, params=params, proofs=pdata)
        *_, ok = pv.verify_aggregation_proofs_in_chip(
            ctx, nchip, schip, pchip, [cp], agg_t)
        return ok

    assert verify(proof)

    bad = bytearray(proof)
    bad[0] ^= 1  # first proof word: an advice commitment coordinate
    try:
        ok = verify(bytes(bad))
    except Exception:
        ok = False  # malformed point/scalar rejected at transcript level
    assert not ok, "corrupted proof verified under compat digest"
