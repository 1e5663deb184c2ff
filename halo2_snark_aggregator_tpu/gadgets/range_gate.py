"""Range gate: lookup-table range checks (reference B3, gates/range_gate.rs).

A fixed table column holds [0, 2^range_bits); advice cells are constrained
into ranges by lookup. The reference pins COMMON_RANGE_BITS=17 and four
lookup families (common / w_ceil-leading / n_floor-leading / d-leading);
here the bit widths are parameters: `RangeGate.configure(cs, bits_list)`
builds one (table, input-column) lookup family per distinct width, and
`check_range(ctx, cell, bits)` decomposes a value into looked-up chunks
recombined on the base gate.

range_bits is configurable so gadget tests run at small k (the reference's
2^17-row tables force k>=18, impractical for the host MockProver); production
configs use 17 bits for BN254 Fq limbs (68 = 4 x 17).
"""

from __future__ import annotations

import dataclasses

from ..ff.bn254 import R
from ..protocol.plonk import Column, ConstraintSystem
from .base_gate import BaseGate, Context, pair


@dataclasses.dataclass
class RangeGateConfig:
    bits: int
    table: Column          # fixed lookup table [0, 2^bits)
    inputs: list[Column]   # advice columns whose cells are range-looked-up
    selectors: list[Column]  # fixed 0/1 gating per input column


class RangeGate:
    """One lookup family; compose several for multiple widths."""

    def __init__(self, config: RangeGateConfig, base_gate: BaseGate):
        self.config = config
        self.base_gate = base_gate

    @staticmethod
    def configure(cs: ConstraintSystem, bits: int, n_inputs: int = 1) -> RangeGateConfig:
        table = cs.fixed_column()
        inputs = [cs.advice_column() for _ in range(n_inputs)]
        selectors = [cs.fixed_column() for _ in range(n_inputs)]
        for inp, sel in zip(inputs, selectors):
            cs.enable_equality(inp)
            # gated lookup: sel * value must be in table (0 is in the table,
            # so ungated rows pass with sel = 0)
            cs.lookup(
                f"range{bits}",
                [(cs.query_fixed(sel, 0) * cs.query_advice(inp, 0), cs.query_fixed(table, 0))],
            )
        return RangeGateConfig(bits, table, inputs, selectors)

    def init_table(self, assigner):
        """Fill the fixed table (range_gate.rs init_table)."""
        for i in range(1 << self.config.bits):
            assigner.assign_fixed(self.config.table, i, i)

    def _lookup_cell(self, ctx: Context, value: int):
        """Place `value` in the gated lookup column; bind it to a base-gate
        cell via equality and return that cell."""
        cfg = self.config
        asg = ctx.assignment
        col = cfg.inputs[0]
        sel = cfg.selectors[0]
        row = getattr(ctx, "range_offset", 0)
        asg.assign_advice(col, row, value)
        asg.assign_fixed(sel, row, 1)
        ctx.range_offset = row + 1
        base_cell = self.base_gate.assign(ctx, value)
        asg.copy(col, row, self.base_gate.config.advice[base_cell.col], base_cell.row)
        return base_cell

    def assign_ranged(self, ctx: Context, value: int, bits_total: int):
        """Witness `value` < 2^bits_total: decompose into table-width chunks
        (the leading chunk tightened to its exact width via the shift trick —
        the parametric analog of the reference's leading-limb lookup
        families), recombine on the base gate. Returns the recombined cell."""
        bits = self.config.bits
        chunks = -(-bits_total // bits)
        assert 0 <= value < (1 << bits_total), "witness exceeds range"
        mask = (1 << bits) - 1
        gate = self.base_gate
        terms = []
        for i in range(chunks):
            chunk_v = (value >> (bits * i)) & mask
            cell = self._lookup_cell(ctx, chunk_v)
            leading_bits = bits_total - bits * i
            if leading_bits < bits:
                # tighten: chunk < 2^leading_bits via looking up the shifted
                # value and binding shifted = chunk * 2^(bits - leading)
                shift = bits - leading_bits
                shifted = self._lookup_cell(ctx, chunk_v << shift)
                gate.one_line(
                    ctx,
                    [pair(cell, pow(2, shift, R)), pair(shifted, R - 1)],
                )
            terms.append((cell, pow(2, bits * i, R)))
        return gate.sum_with_coeff_and_constant(ctx, terms, 0)

    def check_range(self, ctx: Context, cell, bits_total: int):
        """Constrain an existing base-gate cell to [0, 2^bits_total)."""
        recombined = self.assign_ranged(ctx, int(cell), bits_total)
        self.base_gate.assert_equal(ctx, cell, recombined)
        return recombined
