"""Circuit context: arith chips that EMIT CONSTRAINTS while computing.

The third instantiation of the context family (reference L2 "circuit chips",
halo2-snark-aggregator-circuit/src/chips/*): the same protocol algorithms
(Poseidon sponge, transcript replay, query construction) run unchanged, but
every chip call lays down base-gate rows, producing the aggregation circuit.

`CircuitFieldChip` implements the FieldChip interface over the universal base
gate (scalar_chip.rs:10-127 analog; div -> div_unsafe at :92-99).
`CircuitEccChip` (non-native points over the integer chip) lands with the
in-circuit MSM in a later round; its point type already carries the
(x, y, z-flag) layout of the reference's AssignedPoint.
"""

from __future__ import annotations

from ..gadgets.base_gate import AssignedCell, BaseGate, Context
from .api import FieldChip


class CircuitFieldChip(FieldChip):
    """FieldChip over base-gate rows. AssignedValue = AssignedCell."""

    def __init__(self, gate: BaseGate):
        self.gate = gate

    def assign_const(self, ctx: Context, v: int) -> AssignedCell:
        return self.gate.assign_constant(ctx, v)

    def assign_var(self, ctx: Context, v: int) -> AssignedCell:
        return self.gate.assign(ctx, v)

    def to_value(self, a: AssignedCell) -> int:
        return int(a)

    def add(self, ctx, a, b):
        return self.gate.add(ctx, a, b)

    def sub(self, ctx, a, b):
        return self.gate.sub(ctx, a, b)

    def neg(self, ctx, a):
        return self.gate.neg(ctx, a)

    def mul(self, ctx, a, b):
        return self.gate.mul(ctx, a, b)

    def div(self, ctx, a, b):
        # div_unsafe: b != 0 is the caller's obligation, matching the
        # reference ScalarChip (scalar_chip.rs:92-99)
        return self.gate.div_unsafe(ctx, a, b)

    def sum_with_coeff_and_constant(self, ctx, pairs, constant):
        return self.gate.sum_with_coeff_and_constant(ctx, list(pairs), constant)

    def mul_add(self, ctx, a, b, c):
        return self.gate.mul_add(ctx, a, b, c)

    def mul_add_constant(self, ctx, a, b, c):
        return self.gate.mul_add_constant(ctx, a, b, c)
