"""Range gate gadget tests (reference five_integer.rs range-check pattern)."""

import random

import pytest

from halo2_snark_aggregator_tpu.gadgets.base_gate import BaseGate, Context
from halo2_snark_aggregator_tpu.gadgets.range_gate import RangeGate
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.protocol.plonk import Circuit

BITS = 6  # small table so the mock prover runs at k=9


class RangeCircuit(Circuit):
    K = 9

    def __init__(self, values_bits: list[tuple[int, int]]):
        self.values_bits = values_bits

    def configure(self, cs):
        base = BaseGate.configure(cs)
        rng = RangeGate.configure(cs, BITS, base)
        return (base, rng)

    def synthesize(self, config, assigner):
        base_cfg, range_cfg = config
        gate = BaseGate(base_cfg)
        rgate = RangeGate(range_cfg, gate)
        ctx = Context(assigner)
        rgate.init_table(assigner)
        for value, bits in self.values_bits:
            cell = gate.assign(ctx, value)
            rgate.check_range(ctx, cell, bits)


def test_range_gate_ok():
    rng = random.Random(0)
    vals = [(rng.randrange(1 << 17), 17) for _ in range(3)]
    vals += [(rng.randrange(1 << 6), 6), ((1 << 17) - 1, 17), (0, 13)]
    MockProver(RangeCircuit(vals), RangeCircuit.K, [[]]).assert_satisfied()


def test_range_gate_rejects_oversized():
    # a 2^16 value claimed to be 13 bits must fail at witness time or mock time
    with pytest.raises((AssertionError, Exception)):
        MockProver(RangeCircuit([(1 << 16, 13)]), RangeCircuit.K, [[]]).assert_satisfied()


def test_range_gate_tight_leading_chunk():
    # 17 = 2*6 + 5: the leading 5-bit chunk must be tightened; value with a
    # 6-bit leading chunk (i.e. >= 2^17) must be rejected by the witness assert
    with pytest.raises(AssertionError):
        MockProver(RangeCircuit([(1 << 17, 17)]), RangeCircuit.K, [[]]).assert_satisfied()
