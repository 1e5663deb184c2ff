"""In-circuit ECC chip tests over a toy curve (reference five_native_ecc.rs
pattern: Add/Double/Mul cases checked against host-computed values inside a
MockProver circuit)."""

import random

from halo2_snark_aggregator_tpu.gadgets.base_gate import BaseGate, Context
from halo2_snark_aggregator_tpu.gadgets.ecc_chip import EccChip
from halo2_snark_aggregator_tpu.gadgets.integer_chip import IntegerChip, WrongField
from halo2_snark_aggregator_tpu.gadgets.range_gate import RangeGate
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.protocol.plonk import Circuit

M89 = (1 << 89) - 1
TOY = WrongField(modulus=M89, limb_bits=23)
RANGE_BITS = 6
CURVE_B = 3


# -- host-side toy-curve arithmetic (oracle) --------------------------------

def _sqrt(a):
    r = pow(a, (M89 + 1) // 4, M89)
    return r if r * r % M89 == a % M89 else None


def _find_point(start_x=2):
    x = start_x
    while True:
        y = _sqrt((x * x * x + CURVE_B) % M89)
        if y is not None and y != 0:
            return (x, y)
        x += 1


def _add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % M89 == 0:
            return None
        lam = 3 * x1 * x1 * pow(2 * y1, -1, M89) % M89
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, M89) % M89
    x3 = (lam * lam - x1 - x2) % M89
    return (x3, (lam * (x1 - x3) - y1) % M89)


def _mul(p, k):
    acc = None
    add = p
    while k:
        if k & 1:
            acc = _add(acc, add)
        add = _add(add, add)
        k >>= 1
    return acc


class EccOpsCircuit(Circuit):
    K = 17

    def configure(self, cs):
        base = BaseGate.configure(cs)
        rng_cfg = RangeGate.configure(cs, RANGE_BITS, base)
        return (base, rng_cfg)

    def synthesize(self, config, assigner):
        base_cfg, rng_cfg = config
        gate = BaseGate(base_cfg)
        rgate = RangeGate(rng_cfg, gate)
        rgate.init_table(assigner)
        ichip = IntegerChip(gate, rgate, TOY)
        ecc = EccChip(ichip, curve_b=CURVE_B, scalar_bits=6)
        ctx = Context(assigner)

        g = _find_point()
        h = _mul(g, 5)

        pg = ecc.assign_point(ctx, g)
        ph = ecc.assign_point(ctx, h)

        # add / double vs oracle
        ecc.assert_equal(ctx, ecc.add(ctx, pg, ph),
                         ecc.assign_constant_point(ctx, _add(g, h)))
        ecc.assert_equal(ctx, ecc.double(ctx, pg),
                         ecc.assign_constant_point(ctx, _add(g, g)))
        # add same point routes through the tangent branch
        ecc.assert_equal(ctx, ecc.add(ctx, pg, pg),
                         ecc.assign_constant_point(ctx, _add(g, g)))
        # inverse pair yields identity
        png = ecc.neg(ctx, pg)
        s = ecc.add(ctx, pg, png)
        gate.assert_true(ctx, s.z)
        # identity operand passthrough
        pid = ecc.assign_identity(ctx)
        ecc.assert_equal(ctx, ecc.add(ctx, pid, ph), ph)

        # scalar mul (6-bit scalar)
        k = 45
        sk = gate.assign_constant(ctx, k)
        ecc.assert_equal(ctx, ecc.scalar_mul(ctx, sk, pg),
                         ecc.assign_constant_point(ctx, _mul(g, k)))

        # shamir simultaneous MSM (ecc_chip.rs:139-244): k1*G + k2*H
        k1, k2 = 29, 53
        s1 = gate.assign_constant(ctx, k1)
        s2 = gate.assign_constant(ctx, k2)
        msm = ecc.shamir(ctx, [pg, ph], [s1, s2])
        expect = _add(_mul(g, k1), _mul(h, k2))
        ecc.assert_equal(ctx, msm, ecc.assign_constant_point(ctx, expect))

        # zero scalar inside an MSM exercises the identity candidate
        s0 = gate.assign_constant(ctx, 0)
        msm0 = ecc.shamir(ctx, [pg, ph], [s0, s2])
        ecc.assert_equal(ctx, msm0,
                         ecc.assign_constant_point(ctx, _mul(h, k2)))

        # constant_mul (ecc_chip.rs:245-279): windowed over constant tables
        kc = 38
        skc = gate.assign_constant(ctx, kc)
        ecc.assert_equal(ctx, ecc.constant_mul(ctx, skc, g),
                         ecc.assign_constant_point(ctx, _mul(g, kc)))


def test_ecc_chip_ops():
    MockProver(EccOpsCircuit(), EccOpsCircuit.K, [[]]).assert_satisfied()
