"""Differential tests for the fused Pallas complete G1 add
(ops/curve_pallas.py) against the host bigint oracle.

The kernel math (_padd_block: two six-wide Montgomery mul waves + modular
add/sub carry chains) is tested as a direct jnp program — one compile,
persisted in the test cache; the pallas_call plumbing (BlockSpec, grid,
limb-major reshapes, padding) is exercised through padd_pallas in
interpreter mode on a single block."""

import random

import numpy as np
import pytest

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import curve_pallas as cp
from halo2_snark_aggregator_tpu.ops import field as fo
from halo2_snark_aggregator_tpu.ops.field_pallas import BLOCK, LANE, LIMBS, SUB


def _block_add(pts_a, pts_b):
    """Run _padd_block directly (jnp, no pallas) on one block."""
    import jax

    A = [c.T.reshape(LIMBS, SUB, LANE) for c in cp.points_to_canon(pts_a)]
    B = [c.T.reshape(LIMBS, SUB, LANE) for c in cp.points_to_canon(pts_b)]
    f = jax.jit(lambda a0, a1, a2, b0, b1, b2: cp._padd_block(
        a0, a1, a2, b0, b1, b2, fo.FQ.p, fo.FQ.p_inv_neg))
    out = [np.asarray(o).reshape(LIMBS, BLOCK).T for o in f(*A, *B)]
    return cp.canon_to_points(tuple(out))


def test_padd_block_matches_oracle():
    rng = random.Random(11)
    pts_a, pts_b = [], []
    for _ in range(40):
        pts_a.append(ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)))
        pts_b.append(ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)))
    # exceptional cases the complete formulas must absorb
    p = ff.g1_mul(ff.G1_GEN, 12345)
    neg_p = (p[0], ff.P - p[1])
    pts_a += [None, p, None, p, p, neg_p]
    pts_b += [p, None, None, p, neg_p, neg_p]
    # pad the block with more random pairs
    while len(pts_a) < BLOCK:
        pts_a.append(pts_a[len(pts_a) % 46])
        pts_b.append(pts_b[len(pts_b) % 46])

    got = _block_add(pts_a, pts_b)
    exp = [ff.g1_add(x, y) for x, y in zip(pts_a, pts_b)]
    assert got == exp


def test_padd_pallas_plumbing():
    """pallas_call path (interpret mode off-TPU): padding, limb-major
    transposes, grid blocking — correctness of a multi-block batch with a
    non-BLOCK-multiple length."""
    rng = random.Random(3)
    n = 10
    pts_a = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    pts_b = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    out = cp.padd_pallas(cp.points_to_canon(pts_a), cp.points_to_canon(pts_b))
    got = cp.canon_to_points(out)
    exp = [ff.g1_add(x, y) for x, y in zip(pts_a, pts_b)]
    assert got == exp


def test_canon_roundtrip():
    pts = [None, ff.G1_GEN, ff.g1_double(ff.G1_GEN)]
    assert cp.canon_to_points(cp.points_to_canon(pts)) == pts
