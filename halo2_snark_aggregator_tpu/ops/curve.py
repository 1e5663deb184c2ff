"""Vectorized BN254 G1 arithmetic for TPU (Jacobian coordinates, branchless).

Points are (X, Y, Z) triples of Montgomery-form Fq limb arrays, batched over
leading axes. Identity is encoded as Z == 0. All exceptional cases of the
Jacobian group law (identity operands, doubling, inverse pairs) are resolved
with `jnp.where` selects so the same compiled program handles every input —
the TPU-native replacement for the reference's branchy host curve ops
(halo2curves) and its in-circuit complete-add bisec trees
(halo2-ecc-circuit-lib/src/chips/ecc_chip.rs:383-419).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from . import field as fo

FQ = fo.FQ


def _c(v: int) -> np.ndarray:
    return FQ.to_mont_int(v)


def identity(shape=()):
    z = jnp.zeros(shape + (fo.LIMBS,), dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont), shape + (fo.LIMBS,))
    return (one, one, z)


def from_affine_ints(points) -> tuple:
    """Host list of affine points (int tuples / None) -> batched Jacobian arrays."""
    n = len(points)
    xs = np.zeros((n, fo.LIMBS), dtype=np.uint32)
    ys = np.zeros((n, fo.LIMBS), dtype=np.uint32)
    zs = np.zeros((n, fo.LIMBS), dtype=np.uint32)
    one = FQ.one_mont
    for i, pt in enumerate(points):
        if pt is None:
            xs[i] = one
            ys[i] = one
        else:
            xs[i] = FQ.to_mont_int(pt[0])
            ys[i] = FQ.to_mont_int(pt[1])
            zs[i] = one
    return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs)


def to_affine_ints(p) -> list:
    """Batched Jacobian -> host list of affine int tuples / None."""
    x, y, z = (np.asarray(c) for c in p)
    flat_x = x.reshape(-1, fo.LIMBS)
    flat_y = y.reshape(-1, fo.LIMBS)
    flat_z = z.reshape(-1, fo.LIMBS)
    out = []
    for xi, yi, zi in zip(flat_x, flat_y, flat_z):
        zv = FQ.from_mont_limbs(zi)
        if zv == 0:
            out.append(None)
            continue
        xv = FQ.from_mont_limbs(xi)
        yv = FQ.from_mont_limbs(yi)
        zinv = pow(zv, -1, ff.P)
        out.append((xv * zinv * zinv % ff.P, yv * zinv % ff.P * zinv % ff.P * zinv % ff.P))
    return out


def _mul(a, b):
    return fo.mont_mul(FQ, a, b)


def _sqr(a):
    return fo.mont_mul(FQ, a, a)


def _add(a, b):
    return fo.add(FQ, a, b)


def _sub(a, b):
    return fo.sub(FQ, a, b)


def _dbl_f(a):
    return fo.add(FQ, a, a)


def double(p):
    """Jacobian doubling, a = 0 curve. Handles identity/2-torsion via Z3 = 0."""
    x, y, z = p
    a = _sqr(x)
    b = _sqr(y)
    c = _sqr(b)
    d = _sub(_sqr(_add(x, b)), _add(a, c))
    d = _dbl_f(d)
    e = _add(_dbl_f(a), a)  # 3*A
    f = _sqr(e)
    x3 = _sub(f, _dbl_f(d))
    c8 = _dbl_f(_dbl_f(_dbl_f(c)))
    y3 = _sub(_mul(e, _sub(d, x3)), c8)
    z3 = _dbl_f(_mul(y, z))
    return (x3, y3, z3)


def add(p1, p2):
    """Complete Jacobian addition via branchless selects (~16 muls + 1 dbl)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = _sqr(z1)
    z2z2 = _sqr(z2)
    u1 = _mul(x1, z2z2)
    u2 = _mul(x2, z1z1)
    s1 = _mul(y1, _mul(z2, z2z2))
    s2 = _mul(y2, _mul(z1, z1z1))
    h = _sub(u2, u1)
    r = _sub(s2, s1)

    hh = _sqr(h)
    hhh = _mul(h, hh)
    v = _mul(u1, hh)
    x3 = _sub(_sub(_sqr(r), hhh), _dbl_f(v))
    y3 = _sub(_mul(r, _sub(v, x3)), _mul(s1, hhh))
    z3 = _mul(h, _mul(z1, z2))

    p1_inf = fo.is_zero(z1)
    p2_inf = fo.is_zero(z2)
    same_x = fo.is_zero(h) & ~p1_inf & ~p2_inf
    is_dbl = same_x & fo.is_zero(r)
    is_opp = same_x & ~fo.is_zero(r)

    dx, dy, dz = double(p1)

    def sel(c, a, b):
        return fo.select(c, a, b)

    zero = jnp.zeros_like(z3)
    # priority: p1_inf -> p2 ; p2_inf -> p1 ; opposite -> identity ; dbl ; add
    x_out = sel(p1_inf, x2, sel(p2_inf, x1, sel(is_dbl, dx, x3)))
    y_out = sel(p1_inf, y2, sel(p2_inf, y1, sel(is_dbl, dy, y3)))
    z_out = sel(p1_inf, z2, sel(p2_inf, z1, sel(is_opp, zero, sel(is_dbl, dz, z3))))
    return (x_out, y_out, z_out)


def select_point(cond, p1, p2):
    return tuple(fo.select(cond, a, b) for a, b in zip(p1, p2))


def scalar_mul(p, scalar_limbs):
    """Double-and-add over 256 bits (batched). scalar_limbs: uint32[..., 16]
    standard-form 16-bit limbs."""
    import jax

    acc = identity(scalar_limbs.shape[:-1])

    def body(i, acc):
        acc = double(acc)
        idx = 255 - i
        limb = jax.lax.dynamic_index_in_dim(
            scalar_limbs, idx // fo.LIMB_BITS, axis=-1, keepdims=False
        )
        bit = ((limb >> (idx % fo.LIMB_BITS)) & 1) != 0
        return select_point(bit, add(acc, p), acc)

    return jax.lax.fori_loop(0, 256, body, acc)


def is_on_curve(p):
    """y^2 == x^3 + 3 z^6 (Jacobian, b=3); identity passes."""
    x, y, z = p
    y2 = _sqr(y)
    x3 = _mul(_sqr(x), x)
    z2 = _sqr(z)
    z6 = _mul(_sqr(z2), z2)
    b_mont = jnp.broadcast_to(jnp.asarray(_c(ff.G1_B)), x.shape)
    rhs = _add(x3, _mul(b_mont, z6))
    return fo.eq(y2, rhs) | fo.is_zero(z)
