"""Pallas TPU kernel: batched complete G1 addition (RCB15 Algorithm 7, a=0).

Why this exists: the MSM bucket accumulate is HBM-bandwidth-bound under the
jnp RR path — one complete add is ~14 Montgomery muls, each lowering to
hundreds of small XLA ops that round-trip the whole (batch, limbs) tensor
through HBM (~0.5 MB of traffic per element per add). This kernel fuses the
ENTIRE addition — 12 muls (via ops/field_pallas' Montgomery core), the b3/3
scale chains, and all modular adds/subs — into one VMEM-resident program:
traffic drops to reading the two operands and writing the result
(~1.2 KB/element), the speed-of-light for the operation.

Layout: canonical 16x16-bit Montgomery limbs (ops/field.py FieldSpec FQ),
limb-major (16, n) uint32 arrays, BLOCK=1024 elements per grid step —
identical conventions to ops/field_pallas. Completeness: RCB Algorithm 7
handles identity ((0, 1, 0) in Montgomery), doubling, and inverse inputs
with no branches, so the kernel needs no masks for exceptional cases.

Differentially tested against the host oracle (and curve_rr) in
tests/test_curve_pallas.py; off-TPU it runs the Pallas interpreter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as fo
from .field_pallas import (
    BLOCK,
    LANE,
    LIMB_BITS,
    LIMBS,
    MASK,
    SUB,
    _mont_mul_block,
    _on_tpu,
)

FQ = fo.FQ


def _mod_add(a_rows, b_rows, p_rows):
    """(a + b) mod p on 16-limb tile lists; inputs < p."""
    s, c = [], None
    for i in range(LIMBS):
        t = a_rows[i] + b_rows[i] + (c if c is not None else 0)
        s.append(t & MASK)
        c = t >> LIMB_BITS
    # conditional subtract p (s < 2p; the carry out of limb 15 joins the
    # borrow decision: full = c*2^256 + s)
    d, borrow = [], None
    for i in range(LIMBS):
        t = s[i] - jnp.uint32(p_rows[i]) - (borrow if borrow is not None else 0)
        d.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    keep_s = jnp.logical_and(borrow == 1, c == 0)  # s < p and no 2^256 bit
    return [jnp.where(keep_s, s[i], d[i]) for i in range(LIMBS)]


def _mod_sub(a_rows, b_rows, p_rows):
    """(a - b) mod p on 16-limb tile lists; inputs < p."""
    d, borrow = [], None
    for i in range(LIMBS):
        t = a_rows[i] - b_rows[i] - (borrow if borrow is not None else 0)
        d.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    underflow = borrow == 1
    # add p back where a < b
    r, c = [], None
    for i in range(LIMBS):
        t = d[i] + jnp.uint32(p_rows[i]) + (c if c is not None else 0)
        r.append(t & MASK)
        c = t >> LIMB_BITS
    return [jnp.where(underflow, r[i], d[i]) for i in range(LIMBS)]


def _rows(t):
    return [t[i] for i in range(LIMBS)]


def _stackk(parts):
    """K row-lists -> one row-list of (K*SUB, LANE) tiles (wave batching:
    XLA/Mosaic compile time scales with instruction count, not data size —
    the same trick as ops/curve_rr._stack; 12 separate muls compile 5-6x
    slower than 2 six-wide waves)."""
    return [jnp.concatenate([p[i] for p in parts], axis=0)
            for i in range(LIMBS)]


def _unstackk(rows, k: int):
    sub_n = rows[0].shape[0] // k
    return [[rows[i][j * sub_n:(j + 1) * sub_n] for i in range(LIMBS)]
            for j in range(k)]


def _padd_block(ax, ay, az, bx, by, bz, p_np, pinv_np):
    """One block of complete adds; inputs/outputs (16, SUB, LANE) uint32
    canonical Montgomery limbs. RCB15 Algorithm 7 with b3 = 9 folded into
    doubling chains, transcribed from ops/curve_rr.add including its wave
    batching: the 12 muls run as TWO six-wide _mont_mul_block instances."""
    p_rows = [int(p_np[i]) for i in range(LIMBS)]

    def mul6(a_rows, b_rows):
        return _rows(_mont_mul_block(jnp.stack(a_rows), jnp.stack(b_rows),
                                     p_np, pinv_np))

    add = functools.partial(_mod_add, p_rows=p_rows)
    sub = functools.partial(_mod_sub, p_rows=p_rows)

    x1, y1, z1 = _rows(ax), _rows(ay), _rows(az)
    x2, y2, z2 = _rows(bx), _rows(by), _rows(bz)

    # pre-sums: (x1+y1, y1+z1, x1+z1, x2+y2, y2+z2, x2+z2)
    s = add(_stackk([x1, y1, x1, x2, y2, x2]),
            _stackk([y1, z1, z1, y2, z2, z2]))
    sp = _unstackk(s, 6)
    # mul wave 1
    w1 = mul6(_stackk([x1, y1, z1] + sp[:3]),
              _stackk([x2, y2, z2] + sp[3:]))
    t0, t1, t2, m3, m4, m5 = _unstackk(w1, 6)
    ps = add(_stackk([t0, t1, t0]), _stackk([t1, t2, t2]))
    t3, t4, ty = _unstackk(sub(_stackk([m3, m4, m5]), ps), 3)
    # scale chains: t2b = 9*t2, y3b = 9*ty, x3 = 3*t0 (as 8a+a / 2a+a)
    a1 = _stackk([t2, ty, t0])
    a2 = add(a1, a1)
    a4 = add(a2, a2)
    a8 = add(a4, a4)
    a2p, a8p = _unstackk(a2, 3), _unstackk(a8, 3)
    t2b, y3b, x3 = _unstackk(add(_stackk([a8p[0], a8p[1], a2p[2]]), a1), 3)
    z3s = add(t1, t2b)
    t1m = sub(t1, t2b)
    # mul wave 2
    w2 = mul6(_stackk([t3, t4, t1m, y3b, z3s, x3]),
              _stackk([t1m, y3b, z3s, x3, t4, t3]))
    w = _unstackk(w2, 6)
    x_out = sub(w[0], w[1])
    yz = add(_stackk([w[2], w[4]]), _stackk([w[3], w[5]]))
    y_out, z_out = _unstackk(yz, 2)
    return jnp.stack(x_out), jnp.stack(y_out), jnp.stack(z_out)


def _kernel(p_np, pinv_np, ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
            ox_ref, oy_ref, oz_ref):
    def tiles(ref):
        return ref[:].reshape(LIMBS, SUB, LANE)

    ox, oy, oz = _padd_block(tiles(ax_ref), tiles(ay_ref), tiles(az_ref),
                             tiles(bx_ref), tiles(by_ref), tiles(bz_ref),
                             p_np, pinv_np)
    ox_ref[:] = ox.reshape(LIMBS, BLOCK)
    oy_ref[:] = oy.reshape(LIMBS, BLOCK)
    oz_ref[:] = oz.reshape(LIMBS, BLOCK)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _padd_lm(ax, ay, az, bx, by, bz, interpret: bool):
    """Limb-major entry: six uint32[16, n] with n a multiple of BLOCK."""
    n = ax.shape[1]
    kern = functools.partial(_kernel, FQ.p, FQ.p_inv_neg)
    spec = pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((LIMBS, n), jnp.uint32)
    return pl.pallas_call(
        kern,
        out_shape=(out, out, out),
        grid=(n // BLOCK,),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(ax, ay, az, bx, by, bz)


def padd_pallas(a, b, interpret: bool | None = None):
    """Complete G1 add on batched canonical Montgomery points.

    a, b: 3-tuples of uint32[n, 16] (projective X, Y, Z; identity (0,1,0) in
    Montgomery form). Returns the same layout. Pads n to a BLOCK multiple
    around the kernel (identity padding is unnecessary — any garbage limbs
    stay in the padded tail and are sliced off)."""
    if interpret is None:
        interpret = not _on_tpu()
    comps = [jnp.asarray(c) for c in (*a, *b)]
    n = comps[0].shape[0]
    padded = ((n + BLOCK - 1) // BLOCK) * BLOCK
    if padded != n:
        comps = [jnp.pad(c, ((0, padded - n), (0, 0))) for c in comps]
    out = _padd_lm(*(c.T for c in comps), interpret=interpret)
    return tuple(o.T[:n] for o in out)


# -- host-format helpers (tests / staging) -----------------------------------

def points_to_canon(points) -> tuple:
    """Host affine int points (None = identity) -> canonical Montgomery
    projective (n, 16) uint32 triple."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [1 if p is None else p[1] for p in points]
    zs = [0 if p is None else 1 for p in points]
    return tuple(
        fo.FQ.to_mont_ints(v).astype(np.uint32) for v in (xs, ys, zs)
    )


def canon_to_points(triple) -> list:
    """Inverse of points_to_canon (full normalization via host inversion)."""
    from ..ff import bn254 as ff

    xs, ys, zs = (np.asarray(c) for c in triple)
    out = []
    for i in range(xs.shape[0]):
        x = fo.FQ.from_mont_limbs(xs[i])
        y = fo.FQ.from_mont_limbs(ys[i])
        z = fo.FQ.from_mont_limbs(zs[i])
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, ff.P)
            out.append((x * zi % ff.P, y * zi % ff.P))
    return out
