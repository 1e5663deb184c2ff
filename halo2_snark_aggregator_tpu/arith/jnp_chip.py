"""Fully-traced batched context: proofs as a JAX batch axis.

The TPU-first answer to SURVEY §2.6's "vectorize EvaluationQuerySchema
evaluation over batches of proofs": all proofs of one vk share the protocol's
control flow, so the whole transcript replay + query construction + schema
folding traces to ONE XLA program where every assigned scalar is a
uint32[B, 32] redundant-Montgomery array (ops/field_rr) and every transcript
point a pair of Fq arrays. Poseidon absorption dispatches to the fused
batched permutation (ops/poseidon_rr) through the chip-generic sponge's
`poseidon_permute` hook.

Points in this context are (x: RR_fq, y: RR_fq) affine pairs; the identity
cannot occur among transcript/commitment points of a valid proof (the
reference also rejects infinity in transcripts, sha.rs:97-102). Curve
arithmetic on them (instance-commitment MSMs, generator terms) uses the
complete projective formulas. The final MSM is NOT folded per-proof: the
batched driver (protocol/batched.py) flattens per-proof scalars with
lambda-RLC weights into one Pippenger call.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from ..hashes import poseidon_spec as pspec
from ..ops import curve_rr as cvr
from ..ops import field_rr as fr
from ..ops import poseidon_rr
from .api import EccChip, FieldChip

FR = fr.FR
FQ = fr.FQ


def batch_const(spec, v: int, batch: int) -> fr.RR:
    arr = np.broadcast_to(spec.to_mont_int(v % spec.modulus), (batch, fr.NLIMBS))
    return fr.RR(jnp.asarray(arr.copy()), 8)


@dataclasses.dataclass
class BatchedPoint:
    """Affine point batch: x, y in Fq (RR). Non-identity by construction."""

    x: fr.RR
    y: fr.RR

    def to_projective(self):
        one = fr.RR(
            jnp.broadcast_to(jnp.asarray(FQ.one_mont), self.x.limbs.shape), 8
        )
        return (self.x, self.y, one)


class JnpFieldChip(FieldChip):
    def __init__(self, batch: int, spec=FR):
        self.batch = batch
        self.spec = spec

    def assign_const(self, ctx, v: int) -> fr.RR:
        return batch_const(self.spec, v, self.batch)

    def assign_var(self, ctx, v) -> fr.RR:
        if isinstance(v, fr.RR):
            return v
        return self.assign_const(ctx, v)

    def to_value(self, a: fr.RR):
        return a

    def add(self, ctx, a, b):
        return fr.add(self.spec, a, b)

    def sub(self, ctx, a, b):
        return fr.sub(self.spec, a, b)

    def neg(self, ctx, a):
        return fr.sub(self.spec, self.assign_const(ctx, 0), a)

    def mul(self, ctx, a, b):
        return fr.mont_mul(self.spec, a, b)

    def div(self, ctx, a, b):
        return fr.mont_mul(self.spec, a, fr.inv(self.spec, b))

    def pow_constant(self, ctx, base, exponent: int):
        return fr.pow_const(self.spec, base, exponent)

    def sum_with_coeff_and_constant(self, ctx, pairs, constant):
        acc = self.assign_const(ctx, constant)
        for v, c in pairs:
            if c == 1:
                acc = fr.add(self.spec, acc, v)
            else:
                term = fr.mont_mul(self.spec, v, self.assign_const(ctx, c))
                acc = fr.add(self.spec, acc, term)
        return acc

    # fused Poseidon hook for hashes/poseidon_chip.PoseidonChipSponge
    def poseidon_permute(self, ctx, state: list, inputs: list) -> list:
        stacked = fr.RR(
            jnp.stack([s.limbs for s in state], axis=-2),
            max(s.bound for s in state),
        )
        if inputs:
            inp = fr.RR(
                jnp.stack([s.limbs for s in inputs], axis=-2),
                max(s.bound for s in inputs),
            )
        else:
            inp = fr.RR(stacked.limbs[..., :0, :], 1)
        out = poseidon_rr.absorb_chunk(stacked, inp, len(inputs))
        return [fr.RR(out.limbs[..., i, :], out.bound) for i in range(pspec.T)]


class JnpEccChip(EccChip):
    """Curve ops over BatchedPoint (used for instance commitments and the
    generator terms; the main MSM is flattened by the batched driver)."""

    def __init__(self, batch: int):
        self.batch = batch
        self.scalar_chip = JnpFieldChip(batch, FR)
        self.native_chip = self.scalar_chip

    def assign_const(self, ctx, pt) -> BatchedPoint:
        assert pt is not None
        return BatchedPoint(
            fr.RR(jnp.broadcast_to(jnp.asarray(FQ.to_mont_int(pt[0])),
                                   (self.batch, fr.NLIMBS)), 8),
            fr.RR(jnp.broadcast_to(jnp.asarray(FQ.to_mont_int(pt[1])),
                                   (self.batch, fr.NLIMBS)), 8),
        )

    def assign_var(self, ctx, pt) -> BatchedPoint:
        if isinstance(pt, BatchedPoint):
            return pt
        return self.assign_const(ctx, pt)

    def assign_one(self, ctx) -> BatchedPoint:
        return self.assign_const(ctx, ff.G1_GEN)

    def to_value(self, p):
        return p

    def _from_proj(self, proj) -> BatchedPoint:
        # projective -> affine on device (one batched inversion)
        x, y, z = proj
        zinv = fr.inv(FQ, z)
        zinv2 = fr.mont_mul(FQ, zinv, zinv)
        return BatchedPoint(
            fr.mont_mul(FQ, x, zinv),
            fr.mont_mul(FQ, y, zinv),
        )

    def add(self, ctx, p1: BatchedPoint, p2: BatchedPoint) -> BatchedPoint:
        out = cvr.add(p1.to_projective(), p2.to_projective())
        return self._from_proj(out)

    def sub(self, ctx, p1, p2):
        return self.add(ctx, p1, BatchedPoint(p2.x, fr.sub(FQ, fr.RR(p2.x.limbs & jnp.int32(0), 1), p2.y)))

    def scalar_mul(self, ctx, s: fr.RR, p: BatchedPoint) -> BatchedPoint:
        s16 = fr.to_canonical16(FR, s)
        out = cvr.scalar_mul(p.to_projective(), s16)
        return self._from_proj(out)

    def scalar_mul_constant(self, ctx, s: fr.RR, const_pt) -> BatchedPoint:
        return self.scalar_mul(ctx, s, self.assign_const(ctx, const_pt))

    def coords_in_native(self, ctx, nchip, p: BatchedPoint):
        """Fq coords cast into Fr (value mod r) for transcript absorption.

        Device-side cast: canonicalize the Fq value to 16-bit limbs, then
        re-enter Montgomery Fr form via a mul by R^2 after a lossless limb
        reinterpretation (value < 2^254, reduced mod r by the Fr REDC)."""
        def cast(a_fq: fr.RR) -> fr.RR:
            can16 = fr.to_canonical16(FQ, a_fq)  # canonical integer < p
            lo = (can16 & 0xFF).astype(jnp.int32)
            hi = (can16 >> 8).astype(jnp.int32)
            limbs8 = jnp.stack([lo, hi], axis=-1).reshape(*can16.shape[:-1], fr.NLIMBS)
            std = fr.RR(limbs8, 8)  # value as plain integer (not Montgomery)
            r2 = fr.RR(jnp.broadcast_to(jnp.asarray(FR.r2), limbs8.shape), 8)
            return fr.mont_mul(FR, std, r2)  # now Montgomery-form value mod r

        return cast(p.x), cast(p.y)
