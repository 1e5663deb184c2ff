"""BN254 G1 in complete projective coordinates over the redundant field rep.

Uses the Renes–Costello–Batina (2015) complete addition/doubling formulas for
a=0 short-Weierstrass curves (their Algorithms 7 and 9, b3 = 3b = 9): valid
for EVERY input pair — identity, doubling, inverse points — with no
comparisons or selects at all. This matters doubly on TPU:

  * no data-dependent control flow (SURVEY §7 hard part 2: "bucket
    scatter/accumulate is branch-unfriendly");
  * no exact mod-p equality tests, which a redundant (carry-free) field
    representation cannot answer cheaply.

Identity is (0 : 1 : 0). Costs: add 12M+2m(b3), double 6M+2m+1m(b3) over
ops/field_rr.py Montgomery limbs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from . import field_rr as fr

FQ = fr.FQ
B3 = 3 * ff.G1_B  # = 9


def _mul(a, b):
    return fr.mont_mul(FQ, a, b)


def _add(a, b):
    return fr.add(FQ, a, b)


def _sub(a, b):
    return fr.sub(FQ, a, b)


def _b3(a):
    return fr.scale_small(FQ, a, B3)


def identity_like(x: fr.RR):
    zero = fr.zeros_like(x)
    one = fr.const_like(FQ, x, FQ.one_mont)
    return (zero, one, fr.zeros_like(x))


def from_affine_ints(points) -> tuple:
    """Host affine int points (None = identity) -> batched projective RR."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return (
        fr.rr_from_host(FQ, xs),
        fr.rr_from_host(FQ, ys),
        fr.rr_from_host(FQ, zs),
    )


def _sqrt_prog(x: fr.RR):
    """Device: y = (x^3+3)^((p+1)/4), plus canonical forms for the on-curve
    check y^2 == x^3+3 (p = 3 mod 4)."""
    x2 = _mul(x, x)
    t = fr.add(FQ, _mul(x2, x), fr.const_like(FQ, x, FQ.to_mont_int(3)))
    y = fr.pow_const(FQ, t, (ff.P + 1) // 4)
    y2 = _mul(y, y)
    return (
        fr.to_canonical16(FQ, y),
        fr.to_canonical16(FQ, y2),
        fr.to_canonical16(FQ, t),
    )


def decompress_g1_ys(xs_ints: list[int]):
    """Batched G1 decompression on device: for each x, the square root
    y = sqrt(x^3+3) as a standard int (parity NOT yet adjusted), or None if
    x is not on the curve. One jitted program (a 254-step pow scan batched
    over all points) replaces per-point host sqrt — the transcript replay
    decompresses every proof point, which costs ~0.15 ms each in host Python
    (mirrors halo2curves' from_bytes; used by protocol/batched.py)."""
    import jax

    from . import field as fo

    n = len(xs_ints)
    if n == 0:
        return []
    pad = 1 << max(3, (n - 1).bit_length())
    xs = list(xs_ints) + [1] * (pad - n)  # x=1 is on-curve (y^2 = 4)
    x = fr.rr_from_host(FQ, xs)
    y16, y2_16, t16 = jax.jit(_sqrt_prog)(x)
    y16 = np.asarray(y16)
    ok = np.asarray(y2_16) == np.asarray(t16)
    ok = ok.all(axis=-1)
    ys = fo.std_to_ints(y16)
    return [ys[i] if bool(ok[i]) else None for i in range(n)]


def to_affine_ints(p) -> list:
    """Batched projective RR -> host affine int points (None = identity)."""
    xs = fr.rr_to_host(FQ, p[0])
    ys = fr.rr_to_host(FQ, p[1])
    zs = fr.rr_to_host(FQ, p[2])
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, ff.P)
            out.append((x * zi % ff.P, y * zi % ff.P))
    return out


def add(p, q):
    """RCB15 Algorithm 7 (a = 0): complete for all inputs."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = _mul(x1, x2)
    t1 = _mul(y1, y2)
    t2 = _mul(z1, z2)
    t3 = _mul(_add(x1, y1), _add(x2, y2))
    t3 = _sub(t3, _add(t0, t1))          # X1Y2 + X2Y1
    t4 = _mul(_add(y1, z1), _add(y2, z2))
    t4 = _sub(t4, _add(t1, t2))          # Y1Z2 + Y2Z1
    x3 = _mul(_add(x1, z1), _add(x2, z2))
    y3 = _sub(x3, _add(t0, t2))          # X1Z2 + X2Z1
    x3 = _add(_add(t0, t0), t0)          # 3 X1X2
    t2b = _b3(t2)                        # b3 Z1Z2
    z3 = _add(t1, t2b)
    t1 = _sub(t1, t2b)
    y3b = _b3(y3)
    x3_out = _sub(_mul(t3, t1), _mul(t4, y3b))
    y3_out = _add(_mul(t1, z3), _mul(y3b, x3))
    z3_out = _add(_mul(z3, t4), _mul(x3, t3))
    return (x3_out, y3_out, z3_out)


def double(p):
    """RCB15 Algorithm 9 (a = 0): complete (identity in, identity out)."""
    x, y, z = p
    t0 = _mul(y, y)
    z3 = _add(_add(t0, t0), _add(t0, t0))
    z3 = _add(z3, z3)                    # 8 Y^2
    t1 = _mul(y, z)
    t2 = _b3(_mul(z, z))
    x3 = _mul(t2, z3)
    y3 = _add(t0, t2)
    z3 = _mul(t1, z3)
    t1 = _add(t2, t2)
    t2 = _add(t1, t2)
    t0 = _sub(t0, t2)
    y3 = _mul(t0, y3)
    y3 = _add(x3, y3)
    t1 = _mul(x, y)
    x3 = _mul(t0, t1)
    x3 = _add(x3, x3)
    return (x3, y3, z3)


def select_point(cond, p, q):
    return tuple(fr.select(cond, a, b) for a, b in zip(p, q))


def gather_point(p, idx):
    """Index a batched point along the leading axis."""
    return tuple(fr.RR(c.limbs[idx], c.bound) for c in p)


def scalar_mul(p, scalar_limbs16):
    """Double-and-add over 256 bits (batched): scalar_limbs16 uint32[..., 16]
    standard-form 16-bit limbs (ops/field layout). Complete formulas make
    every step branch-free."""
    import jax

    from . import field as fo

    CB = 12  # loop-carry bound

    def pin(pt):
        return tuple(fr.with_bound(c, CB) for c in pt)

    acc = pin(identity_like(p[0]))
    pp = pin(p)

    def body(i, acc):
        acc = pin(double(acc))
        idx = 255 - i
        limb = jax.lax.dynamic_index_in_dim(
            scalar_limbs16, idx // fo.LIMB_BITS, axis=-1, keepdims=False
        )
        bit = ((limb >> (idx % fo.LIMB_BITS)) & 1) != 0
        return pin(select_point(bit, add(acc, pp), acc))

    return jax.lax.fori_loop(0, 256, body, acc)
