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
    """Batched projective RR -> host affine int points (None = identity).

    Montgomery batch inversion: one modular inverse + 3(n-1) mulmods for
    the whole batch instead of one `pow(z, -1, p)` per point (the per-point
    inversions dominated the MSM host-combine at ~0.2 ms each)."""
    xs = fr.rr_to_host(FQ, p[0])
    ys = fr.rr_to_host(FQ, p[1])
    zs = fr.rr_to_host(FQ, p[2])
    nz = [z for z in zs if z != 0]
    inv_of: dict[int, int] = {}
    if nz:
        prefix = [1]
        for z in nz:
            prefix.append(prefix[-1] * z % ff.P)
        inv_all = pow(prefix[-1], -1, ff.P)
        for i in range(len(nz) - 1, -1, -1):
            inv_of[i] = prefix[i] * inv_all % ff.P
            inv_all = inv_all * nz[i] % ff.P
    out = []
    j = 0
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = inv_of[j]
            j += 1
            out.append((x * zi % ff.P, y * zi % ff.P))
    return out


def _stack(rrs, shape):
    """Stack RR values along a new leading axis (widening to a common
    bound): turns k independent field ops into ONE batched op instance.
    XLA compile time scales with instruction count, not data size — the
    unbatched RCB add (12 separate CIOS mont_muls) dominated every MSM
    program's compile; wave-batching cuts it ~5x."""
    bound = max(r.bound for r in rrs)
    return fr.RR(
        jnp.stack([
            jnp.broadcast_to(r.limbs, shape + (fr.NLIMBS,)) for r in rrs
        ]),
        bound,
    )


def _parts(rr: fr.RR):
    return [fr.RR(rr.limbs[i], rr.bound) for i in range(rr.limbs.shape[0])]


def add(p, q):
    """RCB15 Algorithm 7 (a = 0): complete for all inputs. The 12 muls run
    as TWO stacked mont_mul instances (the formula's two dependency waves);
    b3 scales fold into shared doubling chains."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    shape = jnp.broadcast_shapes(x1.limbs.shape[:-1], x2.limbs.shape[:-1])

    # pre-sums: (x1+y1, y1+z1, x1+z1, x2+y2, y2+z2, x2+z2)
    s = _add(_stack([x1, y1, x1, x2, y2, x2], shape),
             _stack([y1, z1, z1, y2, z2, z2], shape))
    sp = _parts(s)
    # mul wave 1
    w1 = _mul(_stack([x1, y1, z1] + sp[:3], shape),
              _stack([x2, y2, z2] + sp[3:], shape))
    t0, t1, t2, m3, m4, m5 = _parts(w1)
    ps = _add(_stack([t0, t1, t0], shape), _stack([t1, t2, t2], shape))
    t3, t4, y3 = _parts(_sub(_stack([m3, m4, m5], shape), ps))
    # scale chains: t2b = b3*t2 = 8t2+t2, y3b = b3*y3, x3 = 3t0 = 2t0+t0
    a1 = _stack([t2, y3, t0], shape)
    a2 = _add(a1, a1)
    a4 = _add(a2, a2)
    a8 = _add(a4, a4)
    a1p, a2p, a8p = _parts(a1), _parts(a2), _parts(a8)
    t2b, y3b, x3 = _parts(
        _add(_stack([a8p[0], a8p[1], a2p[2]], shape), a1))
    z3 = _add(t1, t2b)
    t1m = _sub(t1, t2b)
    # mul wave 2
    w2 = _mul(_stack([t3, t4, t1m, y3b, z3, x3], shape),
              _stack([t1m, y3b, z3, x3, t4, t3], shape))
    w = _parts(w2)
    x3_out = _sub(w[0], w[1])
    yz = _parts(_add(_stack([w[2], w[4]], shape), _stack([w[3], w[5]], shape)))
    return (x3_out, yz[0], yz[1])


def double(p):
    """RCB15 Algorithm 9 (a = 0): complete (identity in, identity out).
    The 8 muls run as TWO stacked mont_mul instances."""
    x, y, z = p
    shape = x.limbs.shape[:-1]

    # mul wave 1: y^2, y*z, z^2, x*y
    w1 = _mul(_stack([y, y, z, x], shape), _stack([y, z, z, y], shape))
    t0, t1, zz, txy = _parts(w1)
    # doubling chains: z3a = 8*y^2 and 8*z^2 (for t2 = 9*z^2 = b3*z^2)
    d1 = _stack([t0, zz], shape)
    d2 = _add(d1, d1)
    d4 = _add(d2, d2)
    d8 = _add(d4, d4)
    d8p = _parts(d8)
    z3a = d8p[0]
    t2 = _add(d8p[1], zz)                # 9 z^2 = b3 z^2
    y3a = _add(t0, t2)
    t2x2 = _add(t2, t2)
    t0b = _sub(t0, _add(t2x2, t2))       # t0 - 3 t2
    # mul wave 2: x3 = t2*z3a, z3 = t1*z3a, y3m = t0b*y3a, xm = t0b*txy
    w2 = _mul(_stack([t2, t1, t0b, t0b], shape),
              _stack([z3a, z3a, y3a, txy], shape))
    w = _parts(w2)
    yx = _parts(_add(_stack([w[0], w[3]], shape), _stack([w[2], w[3]], shape)))
    return (yx[1], yx[0], w[1])


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
