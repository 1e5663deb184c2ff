"""vk transcript-digest injectivity: two verifying keys differing in ANY
single constraint-system or commitment field must produce distinct digests.

The reference binds the verifier to the circuit by hashing Rust's pinned-vk
debug format (halo2-snark-aggregator-api/src/systems/halo2/verify.rs:56-72);
our `VerifyingKey.transcript_repr` hashes its own canonical serialization
(`_pinned_str`). Any field forgotten in that serialization silently weakens
the Fiat-Shamir binding between circuits that differ only in that field —
this test enumerates every CS field and mutates each one in isolation.
"""

import copy

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.protocol.plonk import (
    Column,
    ConstraintSystem,
    Expression,
    LookupArgument,
    VerifyingKey,
)


def _base_vk() -> VerifyingKey:
    cs = ConstraintSystem()
    a = cs.advice_column()
    b = cs.advice_column(1)
    f = cs.fixed_column()
    inst = cs.instance_column()
    cs.enable_equality(a)
    cs.enable_equality(inst)
    r = cs.challenge_usable_after(0)
    a_e = cs.query_advice(a, 0)
    b_e = cs.query_advice(b, 1)
    f_e = cs.query_fixed(f, 0)
    cs.create_gate("g", [f_e * (a_e * b_e - a_e)])
    cs.lookup("lk", [(a_e, f_e)])
    g = ff.G1_GEN
    g2 = ff.g1_double(g)
    return VerifyingKey(k=5, cs=cs, fixed_commitments=[g],
                        permutation_commitments=[g, g2])


def _mutants(vk: VerifyingKey):
    """One mutated deep-copy per serialized field."""
    out = {}

    def mk(name):
        m = copy.deepcopy(vk)
        out[name] = m
        return m

    mk("k").k = 6
    mk("num_fixed").cs.num_fixed_columns += 1
    mk("num_advice").cs.num_advice_columns += 1
    mk("num_instance").cs.num_instance_columns += 1
    mk("num_challenges").cs.num_challenges += 1
    mk("advice_phase").cs.advice_column_phase[1] = 0
    mk("challenge_phase").cs.challenge_phase[0] = 1
    mk("minimum_degree").cs.minimum_degree = 9
    m = mk("fixed_query_rot")
    m.cs.fixed_queries[0] = (m.cs.fixed_queries[0][0],
                             m.cs.fixed_queries[0][1] + 1)
    m = mk("advice_query_rot")
    m.cs.advice_queries[0] = (m.cs.advice_queries[0][0],
                              m.cs.advice_queries[0][1] + 1)
    m = mk("instance_queries")
    m.cs.instance_queries.append((0, 1))
    m = mk("permutation_columns")
    m.cs.permutation_columns = m.cs.permutation_columns[:1]
    m = mk("gate_expr")
    name, polys = m.cs.gates[0]
    m.cs.gates[0] = (name, [polys[0] + Expression.const(1)])
    m = mk("lookup_table")
    lk = m.cs.lookups[0]
    m.cs.lookups[0] = LookupArgument(
        lk.name, lk.input_expressions,
        [e + Expression.const(1) for e in lk.table_expressions])
    m = mk("fixed_commitment")
    m.fixed_commitments = [ff.g1_double(ff.G1_GEN)]
    m = mk("perm_commitment")
    m.permutation_commitments = list(reversed(m.permutation_commitments))
    return out


def test_vk_digest_injective_per_field():
    vk = _base_vk()
    base = vk.transcript_repr()
    digests = {"<base>": base}
    for name, mutant in _mutants(vk).items():
        d = mutant.transcript_repr()
        assert d != base, f"digest ignores field {name!r}"
        digests[name] = d
    # all mutants distinct from each other too (no accidental collisions)
    assert len(set(digests.values())) == len(digests)


def test_vk_digest_deterministic():
    assert _base_vk().transcript_repr() == _base_vk().transcript_repr()
