"""Fused Pallas TPU kernel for the batched Poseidon permutation.

One `pallas_call` runs all 71 rounds (8 full + 63 partial, T=9) with the
state resident in VMEM — the jnp path (ops/poseidon.py) round-trips the
(batch, 9, 16) state through HBM between scan steps; here the only HBM
traffic is one read and one write of the state block per kernel invocation.

Element representation matches ops/field.py: 16x16-bit limbs in uint32,
Montgomery form; in-kernel layout is limb-major (LIMBS, SUB, LANE) tiles so
every limb op is a full native VPU tile op. The schoolbook product uses the
outer-product + static-pad diagonal accumulation of ops/field._conv_columns
(vectorized — NOT an unrolled 16x16 loop), and carries are short unrolled
chains (no lax.scan inside the kernel, per the axon kernel rules).

The MDS row sum is fused BEFORE reduction: the 9 products accumulate in
redundant 32-column space and pay ONE REDC per output element
(T = sum_j mds_ij * s_j < 9p^2 < p*2^256 keeps REDC exact; up to 3
conditional subtracts since U/2^256 < 3.05p).

Round constants are a (71, 9, 16) VMEM operand indexed per round inside
`fori_loop`s (one traced body per phase, mirroring the reference's
start/partial/end schedule, hash/poseidon.rs:193-230); the MDS matrix is
baked in as compile-time constants.

Differentially tested against ops/poseidon.permute (itself tested against
the host oracle) in tests/test_poseidon_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hashes import poseidon_spec as spec
from . import field as fo

T = spec.T                 # 9
LIMBS = fo.LIMBS           # 16
LIMB_BITS = fo.LIMB_BITS   # 16
MASK = fo.MASK
LANE = 128
SUB = 8
BLOCK = SUB * LANE         # states per grid step

NCOLS = 2 * LIMBS


def _conv(a, b, acc=None):
    """Schoolbook column accumulation: a, b are (LIMBS, SUB, LANE) uint32
    (b may be a (LIMBS, 1, 1) constant); returns/extends (NCOLS, SUB, LANE)
    redundant columns. Vectorized outer product + static pads (see
    ops/field._conv_columns); per-call column sums < 2^21 so up to 9
    accumulated convs stay < 2^25 in uint32."""
    prod = a[:, None] * b[None, :]  # (16, 16, SUB, LANE)
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    rows = []
    for i in range(LIMBS):
        rows.append(jnp.pad(lo[i], ((i, NCOLS - LIMBS - i), (0, 0), (0, 0))))
        rows.append(jnp.pad(hi[i], ((i + 1, NCOLS - LIMBS - i - 1), (0, 0), (0, 0))))
    # chained adds, not jnp.sum: Mosaic cannot lower uint32 reductions
    z = rows[0]
    for r in rows[1:]:
        z = z + r
    return z if acc is None else acc + z


def _carry(cols, out_limbs: int):
    """Redundant columns (ncols, SUB, LANE) -> list of 16-bit limb tiles."""
    limbs = []
    c = jnp.zeros_like(cols[0])
    for k in range(out_limbs):
        t = (cols[k] if k < cols.shape[0] else c * 0) + c
        limbs.append(t & MASK)
        c = t >> LIMB_BITS
    return jnp.stack(limbs)


def _cond_sub_p(r, p_ints, times: int):
    """(LIMBS, SUB, LANE) r -= p while r >= p, unrolled `times` times."""
    for _ in range(times):
        d = []
        borrow = jnp.zeros_like(r[0])
        for i in range(LIMBS):
            t = r[i] - jnp.uint32(p_ints[i]) - borrow
            d.append(t & MASK)
            borrow = (t >> LIMB_BITS) & 1
        keep = borrow == 1  # r < p
        r = jnp.where(keep[None], r, jnp.stack(d))
    return r


def _redc(t_limbs, p_arr, pinv_arr, p_ints, n_sub: int):
    """(NCOLS, SUB, LANE) proper limbs T -> (LIMBS, SUB, LANE) T*2^-256."""
    m = _carry(_conv(t_limbs[:LIMBS], pinv_arr)[:LIMBS], LIMBS)
    u_cols = _conv(m, p_arr) + t_limbs
    u = _carry(u_cols, NCOLS)
    return _cond_sub_p(u[LIMBS:], p_ints, n_sub)


def _mont_mul(a, b, p_arr, pinv_arr, p_ints):
    t = _carry(_conv(a, b), NCOLS)
    return _redc(t, p_arr, pinv_arr, p_ints, 1)


def _add_mod(a, b, p_ints):
    out = []
    c = jnp.zeros_like(a[0])
    for i in range(LIMBS):
        t = a[i] + b[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return _cond_sub_p(jnp.stack(out), p_ints, 1)


def _make_kernel():
    # (Array constants cannot be captured by a Pallas kernel body; the MDS
    # matrix and the p / -p^-1 limb vectors enter as VMEM operands, and the
    # per-limb modulus values used by the subtract chains are int scalars.)
    p_ints = [int(v) for v in fo.FR.p]

    def kernel(rc_ref, mds_ref, pc_ref, s_ref, o_ref):
        p_arr = pc_ref[0][:, None, None]      # (16, 1, 1)
        pinv_arr = pc_ref[1][:, None, None]
        half_f = spec.R_F // 2

        def sbox(x):
            x2 = _mont_mul(x, x, p_arr, pinv_arr, p_ints)
            x4 = _mont_mul(x2, x2, p_arr, pinv_arr, p_ints)
            return _mont_mul(x4, x, p_arr, pinv_arr, p_ints)

        def mds_apply(elems):
            out = []
            for i in range(T):
                cols = None
                for j in range(T):
                    cols = _conv(elems[j], mds_ref[i, j][:, None, None], cols)
                t_limbs = _carry(cols, NCOLS)
                out.append(_redc(t_limbs, p_arr, pinv_arr, p_ints, 3))
            return out

        def add_rc(elems, r):
            rc_block = rc_ref[r]  # (9, 16)
            return [
                _add_mod(elems[e],
                         jnp.broadcast_to(rc_block[e][:, None, None],
                                          (LIMBS, SUB, LANE)),
                         p_ints)
                for e in range(T)
            ]

        def unpack(s):
            return [s[e] for e in range(T)]

        def pack(elems):
            return jnp.stack(elems)

        def full_round(r, s):
            elems = add_rc(unpack(s), r)
            elems = [sbox(x) for x in elems]
            return pack(mds_apply(elems))

        def partial_round(r, s):
            elems = add_rc(unpack(s), r)
            elems[0] = sbox(elems[0])
            return pack(mds_apply(elems))

        s = s_ref[:].reshape(T, LIMBS, SUB, LANE)
        s = jax.lax.fori_loop(0, half_f, full_round, s)
        s = jax.lax.fori_loop(half_f, half_f + spec.R_P, partial_round, s)
        s = jax.lax.fori_loop(half_f + spec.R_P, 2 * half_f + spec.R_P,
                              full_round, s)
        o_ref[:] = s.reshape(T, LIMBS, BLOCK)

    return kernel


@functools.lru_cache(maxsize=1)
def _const_arrays():
    rc, mds = spec.generate_constants()
    rc_m = np.stack([np.stack([fo.FR.to_mont_int(c) for c in row]) for row in rc])
    mds_m = np.stack([np.stack([fo.FR.to_mont_int(c) for c in row]) for row in mds])
    pc = np.stack([fo.FR.p, fo.FR.p_inv_neg])
    return rc_m, mds_m, pc  # (71,9,16), (9,9,16), (2,16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _permute_lm(s_lm, interpret: bool):
    """Limb-major entry: uint32[9, 16, n] with n a multiple of BLOCK."""
    n = s_lm.shape[-1]
    rc_m, mds_m, pc = _const_arrays()
    rc = jnp.asarray(rc_m)
    mdsc = jnp.asarray(mds_m)
    pcc = jnp.asarray(pc)
    return pl.pallas_call(
        _make_kernel(),
        out_shape=jax.ShapeDtypeStruct((T, LIMBS, n), jnp.uint32),
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((rc.shape[0], T, LIMBS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, T, LIMBS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LIMBS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LIMBS, BLOCK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, LIMBS, BLOCK), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rc, mdsc, pcc, s_lm)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def permute_pallas(state, interpret: bool | None = None):
    """Drop-in for ops/poseidon.permute on uint32[batch, 9, 16] states.

    Pads the batch up to a BLOCK multiple and transposes to limb-major
    around the kernel. Off-TPU runs the (slow) interpreter — tests only.
    """
    if interpret is None:
        interpret = not _on_tpu()
    s = jnp.asarray(state)
    assert s.ndim == 3 and s.shape[1] == T and s.shape[2] == LIMBS
    n = s.shape[0]
    padded = ((n + BLOCK - 1) // BLOCK) * BLOCK
    if padded != n:
        s = jnp.pad(s, ((0, padded - n), (0, 0), (0, 0)))
    out_lm = _permute_lm(s.transpose(1, 2, 0), interpret)
    return out_lm.transpose(2, 0, 1)[:n]
