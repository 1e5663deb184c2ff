"""Compile-lean BN254 G1: RCB complete projective formulas over the
canonical scan-based field (ops/field.py), with the group law's independent
field ops *wave-batched* into stacked calls.

XLA compile time scales with HLO instruction count, not data size: the
Renes–Costello–Batina a=0 addition needs 12 muls + ~14 adds, and emitting
them as 26 separate op instances costs ~11s of XLA CPU compile per point-add
(ops/curve.py measured). Here the muls land in exactly TWO stacked
`mont_mul` instances (the RCB formula's two dependency waves) and the
adds/subs in ~10 stacked instances, compiling in ~4s — the floor for an
exact-carry engine on a few-core host.

Doubling is just `add(p, p)`: RCB completeness covers it, and the dryrun/
test MSMs that use this engine finish window combination on the host
(bigints), so no separate doubling program is ever compiled.

Used by ops/msm_lite.py for the driver's multi-chip dryrun and the
virtual-mesh sharding tests. Production point arithmetic stays on
ops/curve_rr.py (carry-free, built for the TPU VPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from . import field as fo

FQ = fo.FQ
B3 = 3 * ff.G1_B  # = 9


def _madd(lhs, rhs):
    return fo.add(FQ, lhs, rhs)


def _msub(lhs, rhs):
    return fo.sub(FQ, lhs, rhs)


def _mmul(lhs, rhs):
    return fo.mont_mul(FQ, lhs, rhs)


def identity_like(ref, shape):
    """Identity (0 : 1 : 0) whose arrays derive from `ref` so loop-carry
    varying-axis types line up under shard_map."""
    base = ref.reshape(-1, fo.LIMBS)[0]
    vzero = jnp.broadcast_to(base & jnp.uint32(0), shape + (fo.LIMBS,))
    one = jnp.asarray(FQ.one_mont, dtype=jnp.uint32)
    return (vzero, vzero + one, vzero)


def from_affine_ints(points) -> tuple:
    """Host affine int points (None = identity) -> batched projective
    uint32[N, 16] Montgomery triples."""
    n = len(points)
    xs = np.zeros((n, fo.LIMBS), dtype=np.uint32)
    ys = np.zeros((n, fo.LIMBS), dtype=np.uint32)
    zs = np.zeros((n, fo.LIMBS), dtype=np.uint32)
    one = FQ.one_mont
    for i, pt in enumerate(points):
        if pt is None:
            ys[i] = one
        else:
            xs[i] = FQ.to_mont_int(pt[0])
            ys[i] = FQ.to_mont_int(pt[1])
            zs[i] = one
    return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs)


def to_affine_ints(p) -> list:
    """Batched projective -> host affine int points (None = identity)."""
    x, y, z = (np.asarray(c).reshape(-1, fo.LIMBS) for c in p)
    out = []
    for xi, yi, zi in zip(x, y, z):
        zv = FQ.from_mont_limbs(zi)
        if zv == 0:
            out.append(None)
            continue
        zinv = pow(zv, -1, ff.P)
        out.append((FQ.from_mont_limbs(xi) * zinv % ff.P,
                    FQ.from_mont_limbs(yi) * zinv % ff.P))
    return out


def add(p, q):
    """RCB15 Algorithm 7 (a = 0), wave-batched: complete for all inputs
    (identity, doubling, inverse pairs), no comparisons or selects."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    shape = jnp.broadcast_shapes(x1.shape, x2.shape)

    def stk(*arrs):
        return jnp.stack([jnp.broadcast_to(a, shape) for a in arrs])

    # pre-sums: (x1+y1, y1+z1, x1+z1, x2+y2, y2+z2, x2+z2)
    s = _madd(stk(x1, y1, x1, x2, y2, x2), stk(y1, z1, z1, y2, z2, z2))
    # mul wave 1: t0=x1x2, t1=y1y2, t2=z1z2, m3..m5 = cross sums products
    w1 = _mmul(jnp.concatenate([stk(x1, y1, z1), s[:3]]),
               jnp.concatenate([stk(x2, y2, z2), s[3:]]))
    t0, t1, t2, m3, m4, m5 = w1
    ps = _madd(stk(t0, t1, t0), stk(t1, t2, t2))        # t0+t1, t1+t2, t0+t2
    t3, t4, y3 = _msub(jnp.stack([m3, m4, m5]), ps)     # X1Y2+X2Y1 etc.
    # scale chain: t2b = b3*t2, y3b = b3*y3, x3 = 3*t0 (b3 = 9 = 8+1, 3 = 2+1)
    a1 = jnp.stack([t2, y3, t0])
    a2 = _madd(a1, a1)
    a4 = _madd(a2, a2)
    a8 = _madd(a4, a4)
    t2b, y3b, x3 = _madd(jnp.stack([a8[0], a8[1], a2[2]]), a1)
    z3 = _madd(t1, t2b)
    t1m = _msub(t1, t2b)
    # mul wave 2
    w2 = _mmul(jnp.stack([t3, t4, t1m, y3b, z3, x3]),
               jnp.stack([t1m, y3b, z3, x3, t4, t3]))
    x3_out = _msub(w2[0], w2[1])
    y3z3 = _madd(jnp.stack([w2[2], w2[4]]), jnp.stack([w2[3], w2[5]]))
    return (x3_out, y3z3[0], y3z3[1])


def double(p):
    return add(p, p)


def select_point(cond, p, q):
    return tuple(fo.select(cond, a, b) for a, b in zip(p, q))


def gather_point(p, idx):
    return tuple(c[idx] for c in p)
