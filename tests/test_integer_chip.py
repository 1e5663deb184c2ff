"""Non-native integer chip tests (reference five_integer.rs pattern).

Uses a toy 89-bit wrong field (Mersenne prime 2^89-1) with 23-bit limbs so
MockProver runs at small k; the production instance (BN254 Fq, 68-bit limbs)
uses identical code paths with different parameters.
"""

import random

from halo2_snark_aggregator_tpu.gadgets.base_gate import BaseGate, Context
from halo2_snark_aggregator_tpu.gadgets.integer_chip import IntegerChip, WrongField
from halo2_snark_aggregator_tpu.gadgets.range_gate import RangeGate
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.protocol.plonk import Circuit

M89 = (1 << 89) - 1  # Mersenne prime
TOY = WrongField(modulus=M89, limb_bits=23)
RANGE_BITS = 6


class IntegerOpsCircuit(Circuit):
    K = 13

    def __init__(self, seed=0):
        self.rng = random.Random(seed)

    def configure(self, cs):
        base = BaseGate.configure(cs)
        rng_cfg = RangeGate.configure(cs, RANGE_BITS, base)
        return (base, rng_cfg)

    def synthesize(self, config, assigner):
        base_cfg, rng_cfg = config
        gate = BaseGate(base_cfg)
        rgate = RangeGate(rng_cfg, gate)
        rgate.init_table(assigner)
        chip = IntegerChip(gate, rgate, TOY)
        ctx = Context(assigner)
        rng = self.rng
        W = TOY.modulus

        a_v = rng.randrange(W)
        b_v = rng.randrange(1, W)
        a = chip.assign_w(ctx, a_v)
        b = chip.assign_w(ctx, b_v)

        # add / sub / neg round-trips checked against constants via assert_equal
        s = chip.add(ctx, a, b)
        chip.assert_equal(ctx, s, chip.assign_constant(ctx, (a_v + b_v) % W))
        d = chip.sub(ctx, a, b)
        chip.assert_equal(ctx, d, chip.assign_constant(ctx, (a_v - b_v) % W))
        n = chip.neg(ctx, a)
        chip.assert_equal(ctx, n, chip.assign_constant(ctx, (-a_v) % W))

        # mul / square / div
        m = chip.mul(ctx, a, b)
        chip.assert_equal(ctx, m, chip.assign_constant(ctx, a_v * b_v % W))
        sq = chip.square(ctx, a)
        chip.assert_equal(ctx, sq, chip.assign_constant(ctx, a_v * a_v % W))
        q = chip.div_unsafe(ctx, a, b)
        chip.assert_equal(
            ctx, q, chip.assign_constant(ctx, a_v * pow(b_v, -1, W) % W)
        )

        # is_zero
        zero = chip.assign_constant(ctx, 0)
        gate.assert_true(ctx, chip.is_zero(ctx, zero))
        gate.assert_false(ctx, chip.is_zero(ctx, a))
        # a - a == 0 exercises is_zero after sub/reduce
        gate.assert_true(ctx, chip.is_zero(ctx, chip.sub(ctx, a, a)))

        # bisec
        one_bit = gate.assign_constant(ctx, 1)
        sel = chip.bisec(ctx, one_bit, a, b)
        chip.assert_equal(ctx, sel, a)


def test_integer_chip_ops():
    MockProver(IntegerOpsCircuit(seed=1), IntegerOpsCircuit.K, [[]]).assert_satisfied()


def test_integer_chip_mul_chain():
    class Chain(Circuit):
        def configure(self, cs):
            return IntegerOpsCircuit().configure(cs)

        def synthesize(self, config, assigner):
            base_cfg, rng_cfg = config
            gate = BaseGate(base_cfg)
            rgate = RangeGate(rng_cfg, gate)
            rgate.init_table(assigner)
            chip = IntegerChip(gate, rgate, TOY)
            ctx = Context(assigner)
            W = TOY.modulus
            x_v = 1234567
            x = chip.assign_w(ctx, x_v)
            acc = x
            acc_v = x_v
            for _ in range(5):
                acc = chip.mul(ctx, acc, x)
                acc = chip.add(ctx, acc, acc)
                acc_v = acc_v * x_v * 2 % W
            chip.assert_equal(ctx, acc, chip.assign_constant(ctx, acc_v))

    MockProver(Chain(), 13, [[]]).assert_satisfied()
