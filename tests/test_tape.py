"""Tape recorder/executor differential tests: the same protocol code recorded
once and executed as levelized batched device ops must equal the value
context lane by lane."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from halo2_snark_aggregator_tpu.arith.tape import Tape, TapeFieldChip
from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueFieldChip
from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.hashes.poseidon_chip import PoseidonChipSponge
from halo2_snark_aggregator_tpu.ops import field_rr as fr


def _protocol_fragment(chip, ctx, inputs):
    """A stand-in protocol: transcript absorb/squeeze interleaved with scalar
    math (Horner folds, divisions) — the op mix of the real verifier."""
    sponge = PoseidonChipSponge(chip, ctx)
    a, b, c = inputs
    t = chip.mul_add(ctx, a, b, c)
    sponge.update([a, t])
    ch1 = sponge.squeeze(ctx)
    u = chip.div(ctx, t, chip.add(ctx, ch1, b))
    acc = chip.mul_add_accumulate(ctx, [a, b, u], ch1)
    sponge.update([acc])
    ch2 = sponge.squeeze(ctx)
    out = chip.sum_with_coeff_and_constant(ctx, [(acc, 7), (ch2, 1)], 13)
    return [ch1, u, acc, ch2, out]


def test_tape_matches_value_context():
    rng = random.Random(0)
    batch = 3
    lanes = [[rng.randrange(R) for _ in range(3)] for _ in range(batch)]

    # value-context oracle per lane
    expected = []
    for lane in lanes:
        vctx = ValueContext()
        vchip = ValueFieldChip()
        expected.append(_protocol_fragment(vchip, vctx, lane))

    # record once
    tape = Tape()
    tchip = TapeFieldChip(tape)
    in_slots = [tchip.assign_input(None) for _ in range(3)]
    out_slots = _protocol_fragment(tchip, None, in_slots)

    # execute batched
    run = jax.jit(__import__("halo2_snark_aggregator_tpu.arith.tape", fromlist=["compile_tape"]).compile_tape(tape, batch))
    inputs = np.stack(
        [np.stack([fr.FR.to_mont_int(lane[i]) for lane in lanes]) for i in range(3)]
    )  # (n_inputs, B, 32)
    slots = np.asarray(run(jnp.asarray(inputs)))

    for b in range(batch):
        got = [fr.FR.from_mont_limbs(slots[s.idx, b]) for s in out_slots]
        assert got == expected[b], f"lane {b} mismatch"


def test_tape_stats():
    tape = Tape()
    tchip = TapeFieldChip(tape)
    ins = [tchip.assign_input(None) for _ in range(3)]
    _protocol_fragment(tchip, None, ins)
    segs = tape.segments()
    kinds = [s[0] for s in segs]
    assert "poseidon" in kinds and "inv" in kinds and "ops" in kinds
    assert len(tape.records) > 10
