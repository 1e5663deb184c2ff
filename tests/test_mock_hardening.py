"""MockProver hardening regressions (VERDICT round-1 weak #5).

Each test here encodes a layout bug the round-1 MockProver (131-line thin
oracle) would have PASSED incorrectly: copies over columns never
equality-enabled (halo2 keygen panics — keygen.rs permutation assembly),
used_rows_hint hiding violations past the hinted region, gates/lookups that
fail on the unassigned all-zero tail, and assignments spilling into the
blinding-row region halo2 reserves (ConstraintSystem::blinding_factors).
"""

from __future__ import annotations

import dataclasses

import pytest

from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.protocol.plonk import Circuit, ConstraintSystem


@dataclasses.dataclass
class _Cfg:
    a: object
    b: object
    s: object
    instance: object


class _CopyNoEquality(Circuit):
    """Copies a->b but never enables equality on b."""

    def configure(self, cs: ConstraintSystem) -> _Cfg:
        a = cs.advice_column()
        b = cs.advice_column()
        s = cs.fixed_column()
        inst = cs.instance_column()
        cs.enable_equality(a)  # b deliberately NOT enabled
        cs.create_gate("noop", [cs.query_fixed(s, 0)
                                * (cs.query_advice(a, 0) - cs.query_advice(a, 0))])
        return _Cfg(a, b, s, inst)

    def synthesize(self, config: _Cfg, assigner):
        assigner.assign_advice(config.a, 0, 5)
        assigner.assign_advice(config.b, 1, 5)
        assigner.copy(config.a, 0, config.b, 1)


def test_copy_without_equality_enablement_fails():
    failures = MockProver(_CopyNoEquality(), 4, [[]]).verify()
    assert any(f.kind == "copy" and "enable_equality" in f.detail
               for f in failures), failures


class _HintHidesViolation(Circuit):
    """Gate violated at row 10; used_rows_hint claims only 4 rows used."""

    def configure(self, cs: ConstraintSystem) -> _Cfg:
        a = cs.advice_column()
        b = cs.advice_column()
        s = cs.fixed_column()
        inst = cs.instance_column()
        cs.create_gate("a=b", [cs.query_fixed(s, 0)
                               * (cs.query_advice(a, 0) - cs.query_advice(b, 0))])
        return _Cfg(a, b, s, inst)

    def synthesize(self, config: _Cfg, assigner):
        assigner.assign_fixed(config.s, 10, 1)
        assigner.assign_advice(config.a, 10, 1)
        assigner.assign_advice(config.b, 10, 2)  # violates a=b
        assigner.used_rows_hint = 4  # lies about the used region


def test_used_rows_hint_cannot_hide_violations():
    failures = MockProver(_HintHidesViolation(), 5, [[]]).verify()
    assert any(f.kind == "gate" and "row 10" in f.detail for f in failures), failures


class _TailGateViolation(Circuit):
    """Ungated gate a+1=0 satisfied on the (hinted) assigned rows only: the
    unassigned all-zero tail evaluates to 1 != 0. halo2's prover would
    produce an unsatisfiable h poly; a hint-trusting mock scans past it."""

    def configure(self, cs: ConstraintSystem) -> _Cfg:
        a = cs.advice_column()
        b = cs.advice_column()
        s = cs.fixed_column()
        inst = cs.instance_column()
        cs.create_gate("a+1", [cs.query_advice(a, 0) + Expression_const(1)])
        return _Cfg(a, b, s, inst)

    def synthesize(self, config: _Cfg, assigner):
        for row in range(4):
            assigner.assign_advice(config.a, row, R - 1)  # -1: satisfies a+1=0
        assigner.used_rows_hint = 4


def Expression_const(v: int):
    from halo2_snark_aggregator_tpu.protocol.plonk import Expression

    return Expression.const(v)


def test_all_zero_tail_gate_checked():
    failures = MockProver(_TailGateViolation(), 6, [[]]).verify()
    assert any(f.kind == "gate" and "tail" in f.detail for f in failures), failures


class _TailLookupViolation(Circuit):
    """Lookup input expression with +1 offset: scanned rows hit the table,
    but the zero tail's input tuple (1) is not in the table {2..5, 0}."""

    def configure(self, cs: ConstraintSystem) -> _Cfg:
        a = cs.advice_column()
        b = cs.advice_column()
        t = cs.fixed_column()
        inst = cs.instance_column()
        cs.lookup("off", [(cs.query_advice(a, 0) + Expression_const(1),
                           cs.query_fixed(t, 0))])
        return _Cfg(a, b, t, inst)

    def synthesize(self, config: _Cfg, assigner):
        for row in range(4):
            assigner.assign_fixed(config.s, row, row + 2)  # table {2,3,4,5}
            assigner.assign_advice(config.a, row, row + 1)  # inputs {2..5} ok
        assigner.used_rows_hint = 4


def test_all_zero_tail_lookup_checked():
    failures = MockProver(_TailLookupViolation(), 6, [[]]).verify()
    assert any(f.kind == "lookup" and "tail" in f.detail for f in failures), failures


class _BlindingSpill(Circuit):
    def configure(self, cs: ConstraintSystem) -> _Cfg:
        a = cs.advice_column()
        b = cs.advice_column()
        s = cs.fixed_column()
        inst = cs.instance_column()
        cs.create_gate("noop", [cs.query_fixed(s, 0)
                                * (cs.query_advice(a, 0) - cs.query_advice(b, 0))])
        return _Cfg(a, b, s, inst)

    def synthesize(self, config: _Cfg, assigner):
        # k=4 -> n=16, blinding 5+1 -> usable 10; row 12 is a blinding row
        assigner.assign_advice(config.a, 12, 1)


def test_assignment_into_blinding_rows_raises():
    with pytest.raises(ValueError, match="usable rows"):
        MockProver(_BlindingSpill(), 4, [[]])


def test_honest_circuits_still_pass():
    from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit

    c = SimpleMulCircuit(2, 3)
    MockProver(c, 6, c.instances()).assert_satisfied()
