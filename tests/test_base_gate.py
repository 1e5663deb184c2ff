"""Base-gate gadget tests (reference tests/five_base.rs pattern): exercise
each op inside a circuit, assert expected values in-circuit, check with
MockProver, then prove+verify end-to-end once."""

import random

import pytest

from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.gadgets.base_gate import BaseGate, Context, pair
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.protocol.plonk import Circuit


class BaseGateOpsCircuit(Circuit):
    K = 9

    def __init__(self, seed=0, break_it=False):
        self.rng = random.Random(seed)
        self.break_it = break_it

    def configure(self, cs):
        return BaseGate.configure(cs)

    def synthesize(self, config, assigner):
        gate = BaseGate(config)
        ctx = Context(assigner)
        rng = self.rng
        a_v, b_v = rng.randrange(R), rng.randrange(1, R)

        a = gate.assign(ctx, a_v)
        b = gate.assign(ctx, b_v)

        gate.assert_constant(ctx, gate.add(ctx, a, b), (a_v + b_v) % R)
        gate.assert_constant(ctx, gate.sub(ctx, a, b), (a_v - b_v) % R)
        gate.assert_constant(ctx, gate.neg(ctx, a), (-a_v) % R)
        gate.assert_constant(ctx, gate.mul(ctx, a, b), a_v * b_v % R)
        gate.assert_constant(ctx, gate.mul_add(ctx, a, b, a), (a_v * b_v + a_v) % R)
        gate.assert_constant(ctx, gate.mul_add_constant(ctx, a, b, 5), (a_v * b_v + 5) % R)
        gate.assert_constant(
            ctx, gate.div_unsafe(ctx, a, b), a_v * pow(b_v, -1, R) % R
        )

        # sum with coeffs spanning multiple rows
        terms = [(gate.assign(ctx, rng.randrange(R)), rng.randrange(R)) for _ in range(9)]
        expected = (sum(int(v) * c for v, c in terms) + 77) % R
        got = gate.sum_with_coeff_and_constant(ctx, terms, 77)
        gate.assert_constant(ctx, got, expected)

        # is_zero / invert (complete)
        z = gate.assign_constant(ctx, 0)
        gate.assert_true(ctx, gate.is_zero(ctx, z))
        gate.assert_false(ctx, gate.is_zero(ctx, a))
        cond_z, inv_z = gate.invert(ctx, z)
        gate.assert_true(ctx, cond_z)
        gate.assert_constant(ctx, inv_z, 0)
        cond_b, inv_b = gate.invert(ctx, b)
        gate.assert_false(ctx, cond_b)
        gate.assert_constant(ctx, inv_b, pow(b_v, -1, R))

        # bisec
        one = gate.assign_constant(ctx, 1)
        zero = gate.assign_constant(ctx, 0)
        gate.assert_constant(ctx, gate.bisec(ctx, one, a, b), a_v)
        gate.assert_constant(ctx, gate.bisec(ctx, zero, a, b), b_v)
        gate.assert_bit(ctx, one)
        gate.assert_bit(ctx, zero)
        gate.assert_equal(ctx, a, a)

        if self.break_it:
            gate.assert_constant(ctx, a, (a_v + 1) % R)


def test_base_gate_ops_mock():
    MockProver(BaseGateOpsCircuit(seed=1), BaseGateOpsCircuit.K, [[]]).assert_satisfied()


def test_base_gate_broken_circuit_fails():
    mp = MockProver(BaseGateOpsCircuit(seed=1, break_it=True), BaseGateOpsCircuit.K, [[]])
    assert mp.verify(), "expected failures"


def test_base_gate_prove_verify():
    from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
    from halo2_snark_aggregator_tpu.protocol import verify as pv
    from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead
    from halo2_snark_aggregator_tpu.prover.keygen import keygen
    from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
    from halo2_snark_aggregator_tpu.prover.prove import create_proof
    from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite

    k = BaseGateOpsCircuit.K
    params = ParamsKZG.setup_cached(k)
    circuit = BaseGateOpsCircuit(seed=2)
    vk, pk = keygen(circuit, k, params)
    proof = create_proof(pk, params, [BaseGateOpsCircuit(seed=2)], [[]], PoseidonWrite(), seed=3)

    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = PoseidonTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="basegate", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[[]], transcript=t, key="p0")],
    )
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    assert ok
