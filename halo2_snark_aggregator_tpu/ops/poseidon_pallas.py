"""Fused Pallas TPU kernel for the batched Poseidon permutation.

One `pallas_call` runs all 71 rounds (8 full + 63 partial, T=9) with the
state resident in VMEM — the jnp path (ops/poseidon.py) round-trips the
(batch, 9, 16) state through HBM between scan steps; here the only HBM
traffic is one read and one write of the state block per kernel invocation.

Element representation matches ops/field.py: 16x16-bit limbs in uint32,
Montgomery form; in-kernel layout is limb-major — the state block is
(T, LIMBS, BLOCK) and every limb is a dense (BLOCK,) vector tile (the
row-major (n, 16) layout would pad the 16-limb lane axis to 128). The
Montgomery core (schoolbook column accumulation, unrolled carries, REDC)
is shared with ops/ntt_pallas.

Mosaic lowering rules learned on hardware (v5e):
  * no 1-D -> 3-D shape casts of small constant vectors — the modulus,
    -p^-1 and MDS matrix are baked in as per-limb Python ints
    (compile-time constants; `_conv_const`),
  * the per-round constants, which ARE dynamically indexed (fori_loop round
    counter), live in SMEM as a (71, 144) int32 table read one scalar at a
    time — scalar + vector arithmetic broadcasts natively, and
  * limb rows must be 2-D (SUB, LANE) native tiles inside the fori_loops:
    1-D (BLOCK,) loop-carried vectors abort Mosaic's vector-layout
    inference (layout.h `arr.size() >= layout_rank` check, 1 vs 2) once the
    loop body contains the full round computation.

Measured on v5e (batch 1024): 66 ms/1024 permutes (~15.4k permutes/s),
6.6x over the jnp scan path (ops/poseidon.permute).

The MDS row sum is fused BEFORE reduction: the 9 products accumulate in
redundant 32-column space and pay ONE REDC per output element
(T = sum_j mds_ij * s_j < 9p^2 keeps REDC exact; up to 3 conditional
subtracts since U/2^256 < 3.05p). Round schedule mirrors the reference's
start/partial/end split (hash/poseidon.rs:193-230).

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
from .ntt_pallas import (
    NCOLS,
    _carry,
    _cond_sub_p,
    _conv_const,
    _mont_mul_rows,
    _redc_rows,
)

T = spec.T                 # 9
LIMBS = fo.LIMBS           # 16
LIMB_BITS = fo.LIMB_BITS   # 16
MASK = fo.MASK
LANE = 128
SUB = 8
BLOCK = SUB * LANE         # states per grid step


def _add_rc_rows(a_rows, rc_scalars):
    """a + rc for per-limb SMEM scalars (both < p; one cond-subtract)."""
    out = []
    c = jnp.zeros_like(a_rows[0])
    for i in range(LIMBS):
        t = a_rows[i] + rc_scalars[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return _cond_sub_p(out, 1)


@functools.lru_cache(maxsize=1)
def _kernel_constants():
    rc, mds = spec.generate_constants()
    rc_m = np.stack(
        [np.concatenate([fo.FR.to_mont_int(c) for c in row]) for row in rc]
    ).astype(np.int32)                      # (71, 144) limb scalars
    mds_ints = tuple(
        tuple(tuple(int(v) for v in fo.FR.to_mont_int(c)) for c in row)
        for row in mds
    )                                        # (9, 9, 16) python ints
    return rc_m, mds_ints


def _make_kernel(mds_ints):
    half_f = spec.R_F // 2

    def kernel(rc_ref, s_ref, o_ref):
        def sbox(x_rows):
            x2 = _mont_mul_rows(x_rows, x_rows)
            x4 = _mont_mul_rows(x2, x2)
            return _mont_mul_rows(x4, x_rows)

        def mds_apply(elems):
            out = []
            for i in range(T):
                cols = None
                for j in range(T):
                    c = _conv_const(elems[j], mds_ints[i][j], NCOLS)
                    cols = c if cols is None else [a + b for a, b in zip(cols, c)]
                t_limbs = _carry(cols, NCOLS)
                out.append(_redc_rows(t_limbs, 3))
            return out

        def add_rc(elems, r):
            return [
                _add_rc_rows(
                    elems[e],
                    [
                        rc_ref[r, e * LIMBS + i].astype(jnp.uint32)
                        for i in range(LIMBS)
                    ],
                )
                for e in range(T)
            ]

        def pack(elems):
            return tuple(tuple(rows) for rows in elems)

        def full_round(r, s):
            elems = add_rc([list(rows) for rows in s], r)
            elems = [sbox(x) for x in elems]
            return pack(mds_apply(elems))

        def partial_round(r, s):
            elems = add_rc([list(rows) for rows in s], r)
            elems[0] = sbox(elems[0])
            return pack(mds_apply(elems))

        # Rows are (SUB, LANE) 2-D tiles, not 1-D (BLOCK,) vectors: Mosaic's
        # vector-layout join aborts on 1-D loop-carried values with this body
        # (layout.h rank check 1 vs 2, seen on v5e); the NTT kernels use the
        # same tile shape.
        s_arr = s_ref[:]  # (T, LIMBS, BLOCK)
        s = tuple(
            tuple(s_arr[e, i].reshape(SUB, LANE) for i in range(LIMBS))
            for e in range(T)
        )
        s = jax.lax.fori_loop(0, half_f, full_round, s)
        s = jax.lax.fori_loop(half_f, half_f + spec.R_P, partial_round, s)
        s = jax.lax.fori_loop(half_f + spec.R_P, 2 * half_f + spec.R_P,
                              full_round, s)
        for e in range(T):
            for i in range(LIMBS):
                o_ref[e, i] = s[e][i].reshape(BLOCK)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _permute_lm(s_lm, rc, interpret: bool):
    """Limb-major entry: uint32[9, 16, n] with n a multiple of BLOCK."""
    n = s_lm.shape[-1]
    _, mds_ints = _kernel_constants()
    return pl.pallas_call(
        _make_kernel(mds_ints),
        out_shape=jax.ShapeDtypeStruct((T, LIMBS, n), jnp.uint32),
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((rc.shape[0], T * LIMBS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, LIMBS, BLOCK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, LIMBS, BLOCK), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rc, s_lm)


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
    out_lm = _permute_lm(s.transpose(1, 2, 0), _rc_dev(), interpret)
    return out_lm.transpose(2, 0, 1)[:n]


@functools.lru_cache(maxsize=1)
def _rc_dev():
    """Round-constant table as a cached DEVICE array (no per-call upload)."""
    rc_m, _ = _kernel_constants()
    return jnp.asarray(rc_m)
