"""Pallas TPU kernel for batched BN254 Montgomery multiplication.

Same algorithm as ops/field.py `mont_mul` (16x16-bit limbs in uint32,
schoolbook product with lo/hi column splitting, exact carry, REDC, one
conditional subtract) lowered as ONE fused kernel so the ~50 intermediate
(n,16) arrays of the jnp path never round-trip through HBM:

  * layout is limb-major: the caller's (n,16) batch is transposed to (16,n)
    and each limb row is viewed as (SUB, 128) native VPU tiles — every limb
    operation is a full-tile vector op, and the carry chains are 16/32-step
    *unrolled* Python loops (no lax.scan, per the axon kernel rules);
  * the modulus and -p^{-1} constants are baked into the kernel at trace
    time (they are per-field compile-time constants).

`mont_mul_pallas(spec, a, b)` is a drop-in for `field.mont_mul` on 2D
batches; differentially tested against it in tests/test_field_pallas.py
(interpret mode off-TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as fo

LIMBS = fo.LIMBS          # 16
LIMB_BITS = fo.LIMB_BITS  # 16
MASK = fo.MASK
LANE = 128
SUB = 8
BLOCK = SUB * LANE        # 1024 elements per grid step


def _mont_mul_block(a_t, b_t, p_np: np.ndarray, pinv_np: np.ndarray):
    """One block in limb-major layout: a_t, b_t uint32[16, SUB, LANE].
    Returns uint32[16, SUB, LANE] canonical Montgomery product."""

    def conv(x_rows, y_rows, out_cols):
        """Column sums with lo/hi split; x_rows/y_rows are lists of tiles
        (or per-limb numpy scalars for constant operands)."""
        cols = [None] * (out_cols + 1)

        def acc(k, v):
            if k <= out_cols:
                cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(LIMBS):
            xi = x_rows[i]
            for j in range(LIMBS):
                if i + j > out_cols:
                    continue
                yj = y_rows[j]
                if isinstance(yj, (int, np.integer)):
                    if yj == 0:
                        continue
                    prod = xi * jnp.uint32(yj)
                else:
                    prod = xi * yj
                acc(i + j, prod & MASK)
                acc(i + j + 1, prod >> LIMB_BITS)
        zero = jnp.zeros_like(x_rows[0])
        return [c if c is not None else zero for c in cols[:out_cols]]

    def carry(cols, out_limbs):
        """Redundant columns -> 16-bit limbs, unrolled carry chain."""
        limbs = []
        c = jnp.zeros_like(cols[0])
        for k in range(out_limbs):
            t = (cols[k] if k < len(cols) else jnp.zeros_like(cols[0])) + c
            limbs.append(t & MASK)
            c = t >> LIMB_BITS
        return limbs, c

    a_rows = [a_t[i] for i in range(LIMBS)]
    b_rows = [b_t[i] for i in range(LIMBS)]
    p_rows = [int(p_np[i]) for i in range(LIMBS)]
    pinv_rows = [int(pinv_np[i]) for i in range(LIMBS)]

    # T = a*b (32 limbs)
    t_limbs, _ = carry(conv(a_rows, b_rows, 2 * LIMBS), 2 * LIMBS)
    # m = (T mod 2^256) * p' mod 2^256
    m_limbs, _ = carry(conv(t_limbs[:LIMBS], pinv_rows, LIMBS), LIMBS)
    # U = T + m*p, divisible by 2^256
    mp_cols = conv(m_limbs, p_rows, 2 * LIMBS)
    u_cols = [mp + t for mp, t in zip(mp_cols, t_limbs)]
    u_limbs, _ = carry(u_cols, 2 * LIMBS + 1)
    r = u_limbs[LIMBS : 2 * LIMBS]

    # conditional subtract p (r < 2p)
    d = []
    borrow = jnp.zeros_like(r[0])
    for i in range(LIMBS):
        t = r[i] - jnp.uint32(p_rows[i]) - borrow  # uint32 wraparound
        d.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    keep_r = borrow == 1  # r < p
    return jnp.stack([jnp.where(keep_r, r[i], d[i]) for i in range(LIMBS)])


def _kernel(p_np, pinv_np, a_ref, b_ref, o_ref):
    a_t = a_ref[:].reshape(LIMBS, SUB, LANE)
    b_t = b_ref[:].reshape(LIMBS, SUB, LANE)
    out = _mont_mul_block(a_t, b_t, p_np, pinv_np)
    o_ref[:] = out.reshape(LIMBS, BLOCK)


@functools.partial(jax.jit, static_argnames=("modulus", "interpret"))
def _mont_mul_lm(a_lm, b_lm, modulus: int, interpret: bool):
    """Limb-major entry: uint32[16, n] with n a multiple of BLOCK."""
    spec = fo.FR if modulus == fo.FR.modulus else fo.FQ
    n = a_lm.shape[1]
    kern = functools.partial(_kernel, spec.p, spec.p_inv_neg)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((LIMBS, n), jnp.uint32),
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_lm, b_lm)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def mont_mul_pallas(spec: fo.FieldSpec, a, b, interpret: bool | None = None):
    """Drop-in for field.mont_mul on (n, 16) batches (Montgomery in/out).

    Pads n up to a multiple of BLOCK; transposes to limb-major around the
    kernel. Off-TPU, runs the Pallas interpreter (slow — tests only) unless
    interpret=False is forced.
    """
    if interpret is None:
        interpret = not _on_tpu()
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    assert a.ndim == 2 and a.shape[1] == LIMBS
    n = a.shape[0]
    padded = ((n + BLOCK - 1) // BLOCK) * BLOCK
    if padded != n:
        pad = ((0, padded - n), (0, 0))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    out_lm = _mont_mul_lm(a.T, b.T, spec.modulus, interpret)
    return out_lm.T[:n]
