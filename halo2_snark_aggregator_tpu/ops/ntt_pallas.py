"""Fused Pallas TPU butterfly kernel for the large-k staged NTT.

`ntt_staged` (ops/ntt.py) runs three rowwise jnp programs per stage
(mont_mul, add, sub) over (n, 16) row-major limb arrays. Two costs:

  * each program round-trips its operands/results through HBM, and the jnp
    mont_mul materializes ~50 (n,16) intermediates per chunk;
  * on TPU a (n, 16) uint32 array tiles as (8, 128) — the 16-limb lane axis
    pads to 128, an 8x HBM-bandwidth tax on every access.

This module keeps the whole transform **limb-major** (16, n) — the lane axis
is the element batch, so tiles are dense — and fuses each butterfly stage

    lo = u + v*tw  (mod p),   hi = u - v*tw  (mod p)

into ONE `pallas_call`: per stage the only HBM traffic is one read of u/v/tw
and one write of lo/hi. The Montgomery product is the same schoolbook
column-accumulation + REDC as ops/field_pallas (unrolled carry chains, no
scan, per the axon kernel rules). Twiddle tables are host-precomputed per
stage (ops/ntt._plan) and streamed via BlockSpec index maps: for spans
half >= BLOCK the (16, half) table is re-read every `half/BLOCK` blocks; for
half < BLOCK it is pre-tiled to one BLOCK on host.

The whole transform — input transpose, gather-free device bit-reversal
(ops/ntt.bitrev_dev), all k stages, the inverse 1/n scale — is ONE jitted
program (`_ntt_fused`): device arrays stay resident end-to-end. This
matters enormously under the axon tunnel (~30 ms per materialized dispatch,
~20-60 MB/s host<->device): the earlier per-stage dispatch + host
bit-reversal design measured ~1.07 s for k=18 where the on-device time is
~10 ms.

Mirrors the reference's witness-synthesis FFT hot spot (SURVEY §2.6,
create_proof call sites verify_circuit.rs:986-994) — this is the
TPU-accelerated prover's NTT backend for large k.

Differentially tested against ops/ntt.ntt in tests/test_ntt_pallas.py
(interpret mode on CPU at k=11).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as fo
from .ntt import _plan

FR = fo.FR
LIMBS = fo.LIMBS          # 16
LIMB_BITS = fo.LIMB_BITS  # 16
MASK = fo.MASK
LANE = 128
SUB = 8
BLOCK = SUB * LANE        # 1024 butterflies per grid step
NCOLS = 2 * LIMBS

P_INTS = [int(v) for v in FR.p]
PINV_INTS = [int(v) for v in FR.p_inv_neg]


def _conv(a_rows, b_rows, out_cols):
    """Schoolbook column sums with lo/hi split; rows are (SUB, LANE) tiles."""
    cols = [None] * out_cols

    def acc(k, v):
        if k < out_cols:
            cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(LIMBS):
        for j in range(LIMBS):
            if i + j >= out_cols:
                continue
            prod = a_rows[i] * b_rows[j]
            acc(i + j, prod & MASK)
            acc(i + j + 1, prod >> LIMB_BITS)
    zero = jnp.zeros_like(a_rows[0])
    return [c if c is not None else zero for c in cols]


def _conv_const(a_rows, c_ints, out_cols):
    cols = [None] * out_cols

    def acc(k, v):
        if k < out_cols:
            cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(LIMBS):
        for j in range(LIMBS):
            if i + j >= out_cols or c_ints[j] == 0:
                continue
            prod = a_rows[i] * jnp.uint32(c_ints[j])
            acc(i + j, prod & MASK)
            acc(i + j + 1, prod >> LIMB_BITS)
    zero = jnp.zeros_like(a_rows[0])
    return [c if c is not None else zero for c in cols]


def _carry(cols, out_limbs):
    limbs = []
    c = jnp.zeros_like(cols[0])
    for k in range(out_limbs):
        t = (cols[k] if k < len(cols) else jnp.zeros_like(c)) + c
        limbs.append(t & MASK)
        c = t >> LIMB_BITS
    return limbs


def _cond_sub_p(r_rows, times: int = 1):
    """rows -= p while rows >= p, unrolled `times` passes."""
    for _ in range(times):
        d = []
        borrow = jnp.zeros_like(r_rows[0])
        for i in range(LIMBS):
            t = r_rows[i] - jnp.uint32(P_INTS[i]) - borrow
            d.append(t & MASK)
            borrow = (t >> LIMB_BITS) & 1
        keep = borrow == 1  # r < p
        r_rows = [jnp.where(keep, r_rows[i], d[i]) for i in range(LIMBS)]
    return r_rows


def _redc_rows(t_limbs, n_sub: int = 1):
    """Proper 32-limb T -> T*2^-256 mod p (< p after n_sub cond-subtracts)."""
    m_limbs = _carry(_conv_const(t_limbs[:LIMBS], PINV_INTS, LIMBS), LIMBS)
    mp_cols = _conv_const(m_limbs, P_INTS, NCOLS)
    u_cols = [mp + t for mp, t in zip(mp_cols, t_limbs)]
    u_limbs = _carry(u_cols, NCOLS + 1)
    return _cond_sub_p(u_limbs[LIMBS : 2 * LIMBS], n_sub)


def _mont_mul_rows(a_rows, b_rows):
    t_limbs = _carry(_conv(a_rows, b_rows, NCOLS), NCOLS)
    return _redc_rows(t_limbs, 1)


def _add_mod(a_rows, b_rows):
    out = []
    c = jnp.zeros_like(a_rows[0])
    for i in range(LIMBS):
        t = a_rows[i] + b_rows[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return _cond_sub_p(out)


def _sub_mod(a_rows, b_rows):
    # (a + p) - b in [1, 2p), then one conditional subtract
    apb = []
    c = jnp.zeros_like(a_rows[0])
    for i in range(LIMBS):
        t = a_rows[i] + jnp.uint32(P_INTS[i]) + c
        apb.append(t & MASK)
        c = t >> LIMB_BITS
    d = []
    borrow = jnp.zeros_like(a_rows[0])
    for i in range(LIMBS):
        t = apb[i] - b_rows[i] - borrow
        d.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    return _cond_sub_p(d)


def _butterfly_kernel(u_ref, v_ref, tw_ref, lo_ref, hi_ref):
    u = [u_ref[i].reshape(SUB, LANE) for i in range(LIMBS)]
    v = [v_ref[i].reshape(SUB, LANE) for i in range(LIMBS)]
    tw = [tw_ref[i].reshape(SUB, LANE) for i in range(LIMBS)]
    vt = _mont_mul_rows(v, tw)
    lo = _add_mod(u, vt)
    hi = _sub_mod(u, vt)
    lo_ref[:] = jnp.stack([r.reshape(BLOCK) for r in lo])
    hi_ref[:] = jnp.stack([r.reshape(BLOCK) for r in hi])


def _scale_kernel(c_ints, x_ref, o_ref):
    x = [x_ref[i].reshape(SUB, LANE) for i in range(LIMBS)]
    t_limbs = _carry(_conv_const(x, c_ints, NCOLS), NCOLS)
    m_limbs = _carry(_conv_const(t_limbs[:LIMBS], PINV_INTS, LIMBS), LIMBS)
    mp_cols = _conv_const(m_limbs, P_INTS, NCOLS)
    u_cols = [mp + t for mp, t in zip(mp_cols, t_limbs)]
    u_limbs = _carry(u_cols, NCOLS + 1)
    out = _cond_sub_p(u_limbs[LIMBS : 2 * LIMBS])
    o_ref[:] = jnp.stack([r.reshape(BLOCK) for r in out])


@functools.lru_cache(maxsize=32)
def _plan_lm(k: int, inverse: bool):
    """Limb-major stage twiddles: list of uint32[16, max(half, BLOCK)]
    (spans < BLOCK pre-tiled so the kernel index map is constant).

    Returned as DEVICE arrays, cached for the process lifetime: the tables
    total ~n elements (16 MB at k=18) and the axon tunnel moves ~20-60 MB/s,
    so re-uploading them per call costs more than the transform itself."""
    _, twiddles, n_inv = _plan(k, inverse)
    tws = []
    for tw in twiddles:
        t = np.asarray(tw).T.copy()  # (16, half)
        half = t.shape[1]
        if half < BLOCK:
            t = np.tile(t, (1, BLOCK // half))
        tws.append(jnp.asarray(t))
    n_inv_ints = None
    if inverse:
        n_inv_ints = tuple(int(v) for v in np.asarray(n_inv).reshape(LIMBS))
    return tuple(tws), n_inv_ints


def _butterfly_stage(x, half: int, tw, interpret: bool):
    """One in-place butterfly stage over limb-major x uint32[16, n]."""
    n = x.shape[1]
    blocks = n // (2 * half)
    xr = x.reshape(LIMBS, blocks, 2 * half)
    u = xr[:, :, :half].reshape(LIMBS, -1)
    v = xr[:, :, half:].reshape(LIMBS, -1)
    m = n // 2
    tw_nblocks = tw.shape[1] // BLOCK
    lo, hi = pl.pallas_call(
        _butterfly_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((LIMBS, m), jnp.uint32),
            jax.ShapeDtypeStruct((LIMBS, m), jnp.uint32),
        ],
        grid=(m // BLOCK,),
        in_specs=[
            pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LIMBS, BLOCK), lambda i, tb=tw_nblocks: (0, i % tb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(u, v, tw)
    return jnp.concatenate(
        [lo.reshape(LIMBS, blocks, half), hi.reshape(LIMBS, blocks, half)],
        axis=2,
    ).reshape(LIMBS, n)


@functools.partial(
    jax.jit, static_argnames=("k", "n_inv_ints", "interpret")
)
def _ntt_fused(values, tws, k: int, n_inv_ints, interpret: bool):
    """The WHOLE transform as one program: transpose to limb-major,
    gather-free bit-reversal (ops/ntt.bitrev_dev transpose chain), all
    butterfly stages, optional 1/n scale, transpose back. One dispatch,
    no host round-trips — the axon tunnel moves ~20-60 MB/s with ~30 ms
    per materialized call, so staging this per-stage costs ~100x the
    on-device time."""
    from .ntt import bitrev_dev

    x = values.T  # (16, n) limb-major
    x = bitrev_dev(x, k, axis=1)
    for s, tw in enumerate(tws):
        x = _butterfly_stage(x, 1 << s, tw, interpret)
    if n_inv_ints is not None:
        n = x.shape[1]
        x = pl.pallas_call(
            functools.partial(_scale_kernel, n_inv_ints),
            out_shape=jax.ShapeDtypeStruct((LIMBS, n), jnp.uint32),
            grid=(n // BLOCK,),
            in_specs=[
                pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LIMBS, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x)
    return x.T


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def ntt_pallas(values, k: int, inverse: bool = False,
               interpret: bool | None = None):
    """Drop-in for ops/ntt.ntt_staged: uint32[n, 16] Montgomery in/out,
    in-order results (inverse includes the 1/n scale). Requires k >= 11
    (n/2 must be a BLOCK multiple). Device input stays device-resident
    end-to-end; host input pays one upload."""
    if interpret is None:
        interpret = not _on_tpu()
    n = 1 << k
    assert (n // 2) % BLOCK == 0, "ntt_pallas needs k >= 11"
    tws, n_inv_ints = _plan_lm(k, inverse)
    if isinstance(values, np.ndarray):
        values = fo.np_to_dev(values)
    return _ntt_fused(values, tws, k, n_inv_ints, interpret)
