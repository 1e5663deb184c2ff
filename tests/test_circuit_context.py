"""Circuit-context tests: the SAME protocol code that runs on values also
emits a satisfiable circuit — the reference's one-algorithm-three-contexts
invariant (SURVEY §0), checked here for the Poseidon sponge (the transcript
hot path that dominates the aggregation circuit's scalar work).
"""

import random

from halo2_snark_aggregator_tpu.arith.circuit import CircuitFieldChip
from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueFieldChip
from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.gadgets.base_gate import BaseGate, Context
from halo2_snark_aggregator_tpu.hashes.poseidon_chip import PoseidonChipSponge
from halo2_snark_aggregator_tpu.hashes.poseidon_host import PoseidonSponge
from halo2_snark_aggregator_tpu.prover.mock import MockProver
from halo2_snark_aggregator_tpu.protocol.plonk import Circuit


class PoseidonCircuit(Circuit):
    K = 13

    def __init__(self, inputs, expected):
        self.inputs = inputs
        self.expected = expected

    def configure(self, cs):
        return BaseGate.configure(cs)

    def synthesize(self, config, assigner):
        gate = BaseGate(config)
        chip = CircuitFieldChip(gate)
        ctx = Context(assigner)
        sponge = PoseidonChipSponge(chip, ctx)
        assigned = [chip.assign_var(ctx, v) for v in self.inputs]
        sponge.update(assigned)
        out = sponge.squeeze(ctx)
        gate.assert_constant(ctx, out, self.expected)


def test_in_circuit_poseidon_matches_host():
    rng = random.Random(0)
    inputs = [rng.randrange(R) for _ in range(3)]
    host = PoseidonSponge()
    host.update(inputs)
    expected = host.squeeze()

    # value context agrees
    vctx = ValueContext()
    vchip = ValueFieldChip()
    vs = PoseidonChipSponge(vchip, vctx)
    vs.update(list(inputs))
    assert vs.squeeze(vctx) == expected

    # circuit context: same code path emits a satisfiable circuit
    MockProver(PoseidonCircuit(inputs, expected), PoseidonCircuit.K, [[]]).assert_satisfied()


def test_in_circuit_poseidon_rejects_wrong_output():
    rng = random.Random(1)
    inputs = [rng.randrange(R) for _ in range(2)]
    host = PoseidonSponge()
    host.update(inputs)
    expected = host.squeeze()
    mp = MockProver(PoseidonCircuit(inputs, (expected + 1) % R), PoseidonCircuit.K, [[]])
    assert mp.verify(), "expected constraint failures"
