"""Fused Pallas bucket-accumulate kernel for the Pippenger MSM.

Why this exists: the XLA limb path (ops/field_rr.py + ops/curve_rr.py) is
HBM-bound, not compute-bound — XLA materializes each unrolled CIOS reduction
step of every mont_mul as its own kLoop fusion (observed in v5e OOM dumps:
dozens of s32[6,R,B,64] HLO temps per add), so one complete point add moves
~200 KB of HBM per lane against ~70 Kops of VPU work. Measured ceiling:
~39 k pts/s at 2^16 (BENCH_MSM_AB_r02/r03), ~1.3 M lane-adds/s — about 3 %
of what the VPU could sustain if the temps stayed on-chip. The log-depth
tree rewrite measured 2.4x SLOWER (16.4k) and OOMed at wider budgets —
more HBM-resident levels, same per-step materialization; scheduling cannot
fix a memory-locality problem.

This kernel keeps the whole bucket-accumulate phase in VMEM:

  * canonical 16x16-bit limb arithmetic — inside a kernel, unrolled carry
    chains are full-tile vector ops with no HBM round-trips, so the
    redundant representation (and its doubled limb count) is unnecessary;
  * every value lives as 16 rows of (1, BLOCK) uint32 vectors — NO in-kernel
    reshapes (Mosaic "unsupported shape cast" on (1,1024)->(1,8,128)) and
    no 1-D vectors (v5e vector-layout inference SIGABRTs, see CLAUDE.md);
  * Renes-Costello-Batina mixed addition (2015, Algorithm 8, a=0, b3=9):
    complete for every q != infinity — table points are never the identity
    when unmasked (digit-0 buckets are dropped by the host plan), and
    masked lanes keep the old accumulator via select, exactly like the XLA
    path (ops/msm.py);
  * grid = (lane blocks, trips): trips iterate innermost, so each (row,
    bucket) accumulator block is written to HBM once per DISPATCH, not once
    per trip; the per-trip points stream from a pre-gathered buffer
    (the XLA pregather of ops/msm.py feeds it — one big row-gather program).

The host orchestration (bucket planning, staged dispatches, bucket reduce,
window combine) is shared with ops/msm.py `msm_staged_split` via
accum='pallas'. Replaces the reference's serial `multi_exp` fold
(halo2-snark-aggregator-api/src/arith/ecc.rs:38-60) at the kernel level.
Differentially tested against the host oracle in tests/test_msm_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as fo
from . import field_rr as fr

LIMBS = 16          # 16-bit canonical limbs in uint32
LIMB_BITS = 16
MASK = 0xFFFF       # plain int: a jnp constant here would be CAPTURED by
                    # the kernel trace (pallas rejects closure constants)
LANE = 128          # VPU lane width
SUB = 8             # VPU sublanes per tile
BLOCK = SUB * LANE  # lanes per grid block (one (8,128) tile row per limb)

_FQ = fo.FQ
_P_ROWS = [int(v) for v in _FQ.p]
_PINV_ROWS = [int(v) for v in _FQ.p_inv_neg]


# ---------------------------------------------------------------------------
# Row-list field arithmetic: a value is a list of 16 (1, BLOCK) uint32 rows.
# ---------------------------------------------------------------------------


def _conv(x_rows, y_rows, out_cols):
    """Schoolbook column sums with lo/hi split; y_rows may be Python ints
    (constant operand). Columns stay < 2^32 (<= 32 products of 16x16 bits
    split into 16-bit halves)."""
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


def _carry(cols, out_limbs):
    """Redundant columns -> 16-bit limbs; returns (rows, top carry)."""
    rows = []
    c = jnp.zeros_like(cols[0])
    for k in range(out_limbs):
        t = (cols[k] if k < len(cols) else jnp.zeros_like(cols[0])) + c
        rows.append(t & MASK)
        c = t >> LIMB_BITS
    return rows, c


def _sub_p(rows):
    """rows - p with borrow chain; returns (diff rows, borrow flag row)."""
    d = []
    borrow = jnp.zeros_like(rows[0])
    for i in range(LIMBS):
        t = rows[i] - jnp.uint32(_P_ROWS[i]) - borrow
        d.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    return d, borrow


def _mont_mul(a_rows, b_rows):
    """Montgomery product on row lists (canonical in/out), one REDC pass
    (mirrors ops/field.py mont_mul; same algorithm as field_pallas)."""
    t_rows, _ = _carry(_conv(a_rows, b_rows, 2 * LIMBS), 2 * LIMBS)
    m_rows, _ = _carry(_conv(t_rows[:LIMBS], _PINV_ROWS, LIMBS), LIMBS)
    mp_cols = _conv(m_rows, _P_ROWS, 2 * LIMBS)
    u_cols = [mp + t for mp, t in zip(mp_cols, t_rows)]
    u_rows, _ = _carry(u_cols, 2 * LIMBS + 1)
    r = u_rows[LIMBS : 2 * LIMBS]
    d, borrow = _sub_p(r)
    keep_r = borrow == 1  # r < p
    return [jnp.where(keep_r, r[i], d[i]) for i in range(LIMBS)]


def _mod_add(a_rows, b_rows):
    s, top = _carry([x + y for x, y in zip(a_rows, b_rows)], LIMBS)
    d, borrow = _sub_p(s)
    keep = jnp.logical_and(borrow == 1, top == 0)  # s < p and no 2^256 bit
    return [jnp.where(keep, s[i], d[i]) for i in range(LIMBS)]


def _mod_sub(a_rows, b_rows):
    d = []
    borrow = jnp.zeros_like(a_rows[0])
    for i in range(LIMBS):
        t = a_rows[i] - b_rows[i] - borrow
        d.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    s = []
    carry = jnp.zeros_like(d[0])
    for i in range(LIMBS):
        t = d[i] + jnp.uint32(_P_ROWS[i]) + carry
        s.append(t & MASK)
        carry = t >> LIMB_BITS
    under = borrow == 1
    return [jnp.where(under, s[i], d[i]) for i in range(LIMBS)]


def _mod_small(x_rows, k: int):
    """k*x mod p for tiny k via an addition chain (k = 9 = b3 here)."""
    if k == 9:
        x2 = _mod_add(x_rows, x_rows)
        x4 = _mod_add(x2, x2)
        x8 = _mod_add(x4, x4)
        return _mod_add(x8, x_rows)
    raise NotImplementedError(k)


def _mixed_add(acc, q):
    """RCB15 Algorithm 8 (a = 0): (X1:Y1:Z1) + (x2, y2), complete for every
    q not at infinity (incl. acc = identity, acc = q doubling, acc = -q)."""
    x1, y1, z1 = acc
    x2, y2 = q
    t0 = _mont_mul(x1, x2)
    t1 = _mont_mul(y1, y2)
    t3 = _mod_add(x2, y2)
    t4 = _mod_add(x1, y1)
    t3 = _mont_mul(t3, t4)
    t4 = _mod_add(t0, t1)
    t3 = _mod_sub(t3, t4)
    t4 = _mont_mul(y2, z1)
    t4 = _mod_add(t4, y1)
    y3 = _mont_mul(x2, z1)
    y3 = _mod_add(y3, x1)
    x3 = _mod_add(t0, t0)
    t0 = _mod_add(x3, t0)
    t2 = _mod_small(z1, 9)          # b3 * Z1
    z3 = _mod_add(t1, t2)
    t1 = _mod_sub(t1, t2)
    y3 = _mod_small(y3, 9)          # b3 * (X2*Z1 + X1)
    x3 = _mont_mul(t4, y3)
    t2 = _mont_mul(t3, t1)
    x3 = _mod_sub(t2, x3)
    y3 = _mont_mul(y3, t0)
    t1m = _mont_mul(t1, z3)
    y3 = _mod_add(t1m, y3)
    t0 = _mont_mul(t0, t3)
    z3 = _mont_mul(z3, t4)
    z3 = _mod_add(z3, t0)
    return x3, y3, z3


def _full_add(p, q):
    """RCB15 Algorithm 7 (a = 0, b3 = 9): complete projective + projective
    addition — valid for every input pair including identities, doubling,
    and inverses. 12 muls + b3 chains on row lists."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = _mont_mul(x1, x2)
    t1 = _mont_mul(y1, y2)
    t2 = _mont_mul(z1, z2)
    t3 = _mod_add(x1, y1)
    t4 = _mod_add(x2, y2)
    t3 = _mont_mul(t3, t4)
    t4 = _mod_add(t0, t1)
    t3 = _mod_sub(t3, t4)
    t4 = _mod_add(y1, z1)
    x3 = _mod_add(y2, z2)
    t4 = _mont_mul(t4, x3)
    x3 = _mod_add(t1, t2)
    t4 = _mod_sub(t4, x3)
    x3 = _mod_add(x1, z1)
    y3 = _mod_add(x2, z2)
    x3 = _mont_mul(x3, y3)
    y3 = _mod_add(t0, t2)
    y3 = _mod_sub(x3, y3)
    x3 = _mod_add(t0, t0)
    t0 = _mod_add(x3, t0)
    t2 = _mod_small(t2, 9)
    z3 = _mod_add(t1, t2)
    t1 = _mod_sub(t1, t2)
    y3 = _mod_small(y3, 9)
    x3 = _mont_mul(t4, y3)
    t2 = _mont_mul(t3, t1)
    x3 = _mod_sub(t2, x3)
    y3 = _mont_mul(y3, t0)
    t1 = _mont_mul(t1, z3)
    y3 = _mod_add(t1, y3)
    t0 = _mont_mul(t0, t3)
    z3 = _mont_mul(z3, t4)
    z3 = _mod_add(z3, t0)
    return x3, y3, z3


def _rows_of(ref_val):
    """(LIMBS*SUB, LANE) tiled block -> list of 16 (SUB, LANE) full-tile
    rows. 2-D slices only: no in-kernel reshapes (Mosaic rejects shape
    casts), no 1-D vectors, and — unlike (1, BLOCK) rows, which leave 7 of
    8 sublanes idle — every vector op runs at full VPU utilization."""
    return [ref_val[i * SUB : (i + 1) * SUB] for i in range(LIMBS)]


def _accum_kernel(t0_ref, px_ref, py_ref, cnt_ref,
                  ax_ref, ay_ref, az_ref,
                  ox_ref, oy_ref, oz_ref):
    """One (lane block, trip) grid step: acc <- select(valid, acc+q, acc).

    Grid is (nblocks, trips) with trips innermost, so o*_ref stays VMEM-
    resident across the whole trip loop and hits HBM once per dispatch.
    All operands arrive pre-tiled (see _tile_lanes): lane l of a block maps
    to (sublane l//LANE, lane l%LANE), and limb i of a value is rows
    [i*SUB, (i+1)*SUB) of a (LIMBS*SUB, LANE) block."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        ox_ref[...] = ax_ref[...]
        oy_ref[...] = ay_ref[...]
        oz_ref[...] = az_ref[...]

    acc = (_rows_of(ox_ref[...]), _rows_of(oy_ref[...]),
           _rows_of(oz_ref[...]))
    q = (_rows_of(px_ref[...]), _rows_of(py_ref[...]))
    nx, ny, nz = _mixed_add(acc, q)

    t_global = t0_ref[0, 0] + t
    valid = t_global < cnt_ref[...]  # (SUB, LANE), aligns with tile rows
    ox_ref[...] = jnp.concatenate(
        [jnp.where(valid, nr, ar) for nr, ar in zip(nx, acc[0])], axis=0)
    oy_ref[...] = jnp.concatenate(
        [jnp.where(valid, nr, ar) for nr, ar in zip(ny, acc[1])], axis=0)
    oz_ref[...] = jnp.concatenate(
        [jnp.where(valid, nr, ar) for nr, ar in zip(nz, acc[2])], axis=0)


def _make_reduce_kernel(nbuckets: int):
    """Suffix bucket reduction, serial in VMEM: for each swept bucket b
    (high to low): running += S_b; total += running. Sweeping b =
    nbuckets-1 .. 1 yields total = sum_b b * S_b (unsigned plans: bucket 0
    never contributes); sweeping down to 0 (include_zero grid) yields
    sum_s (s+1) * S_s — the shifted signed-digit slot weighting. Grid
    (row blocks, sweep steps) with the bucket index REVERSED in the block
    index map; both accumulators stay VMEM-resident across the sweep."""

    def kernel(bx_ref, by_ref, bz_ref,
               rx_ref, ry_ref, rz_ref, tx_ref, ty_ref, tz_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            one_rows = _mont_one16()
            for xref in (rx_ref, rz_ref, tx_ref, tz_ref):
                xref[...] = jnp.zeros((LIMBS * SUB, LANE), jnp.uint32)
            one = jnp.concatenate(
                [jnp.full((SUB, LANE), int(one_rows[i]), jnp.uint32)
                 for i in range(LIMBS)], axis=0)
            ry_ref[...] = one
            ty_ref[...] = one

        s_b = (_rows_of(bx_ref[...]), _rows_of(by_ref[...]),
               _rows_of(bz_ref[...]))
        running = (_rows_of(rx_ref[...]), _rows_of(ry_ref[...]),
                   _rows_of(rz_ref[...]))
        nrx, nry, nrz = _full_add(running, s_b)
        total = (_rows_of(tx_ref[...]), _rows_of(ty_ref[...]),
                 _rows_of(tz_ref[...]))
        ntx, nty, ntz = _full_add(total, (nrx, nry, nrz))
        rx_ref[...] = jnp.concatenate(nrx, axis=0)
        ry_ref[...] = jnp.concatenate(nry, axis=0)
        rz_ref[...] = jnp.concatenate(nrz, axis=0)
        tx_ref[...] = jnp.concatenate(ntx, axis=0)
        ty_ref[...] = jnp.concatenate(nty, axis=0)
        tz_ref[...] = jnp.concatenate(ntz, axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nbuckets", "interpret", "include_zero"))
def reduce_buckets_pallas(bkt_x, bkt_y, bkt_z, nbuckets: int,
                          interpret: bool = False,
                          include_zero: bool = False):
    """Per-row totals sum_b b*S_b (or sum_s (s+1)*S_s with include_zero,
    for shifted signed-digit plans) via the serial VMEM sweep.

    bkt_*: uint32[nbuckets * nbr * 128, LANE] — bucket b's row-block i at
    block row (b * nbr + i); returns three (nbr * 128, LANE) totals."""
    vrows = LIMBS * SUB
    nbr = bkt_x.shape[0] // (nbuckets * vrows)
    grid = (nbr, nbuckets if include_zero else nbuckets - 1)
    b_spec = pl.BlockSpec(
        (vrows, LANE), lambda i, t: ((nbuckets - 1 - t) * nbr + i, 0),
        memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((vrows, LANE), lambda i, t: (i, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_reduce_kernel(nbuckets),
        out_shape=[jax.ShapeDtypeStruct((nbr * vrows, LANE),
                                        jnp.uint32)] * 6,
        grid=grid,
        in_specs=[b_spec, b_spec, b_spec],
        out_specs=[o_spec] * 6,
        interpret=interpret,
    )(bkt_x, bkt_y, bkt_z)
    return outs[3:]  # total accumulators


def accum_steps_pallas(pre_x, pre_y, counts_flat, acc, t0,
                       trips: int, interpret: bool = False):
    """`trips` accumulate steps over pre-gathered points, fused in VMEM.

    pre_x/pre_y: uint32[trips * 16, RB] — trip t's limb-major coords are
    rows [16t, 16(t+1)) (the trip dim is FOLDED into the limb dim so every
    kernel block is natively 2-D: Mosaic rejects the 3-D->2-D squeeze).
    Pre-TILED operands (see _tile_value / _tile_counts):
    pre_x/pre_y: uint32[trips * nb * 128, LANE]; counts: int32[nb*SUB, LANE];
    acc: (x, y, z) uint32[nb * 128, LANE] each, where nb = RB // BLOCK.
    t0: traced int32 scalar (global step offset).

    interpret=True (CPU tests) runs EAGERLY: jitting the interpreted kernel
    hands XLA:CPU a ~10k-op flat module per grid step, which compiles for
    many minutes; eager interpret executes the same ops one by one in
    seconds at test sizes.
    """
    if interpret:
        return _accum_steps_impl(pre_x, pre_y, counts_flat, acc, t0,
                                 trips, True)
    return _accum_steps_jit(pre_x, pre_y, counts_flat, acc, t0, trips)


@functools.partial(jax.jit, static_argnames=("trips",))
def _accum_steps_jit(pre_x, pre_y, counts_flat, acc, t0, trips: int):
    return _accum_steps_impl(pre_x, pre_y, counts_flat, acc, t0, trips,
                             False)


def _accum_steps_impl(pre_x, pre_y, counts_flat, acc, t0,
                      trips: int, interpret: bool):
    vrows = LIMBS * SUB  # tile rows per value block
    nblocks = acc[0].shape[0] // vrows
    t0_arr = jnp.reshape(t0.astype(jnp.int32), (1, 1))
    grid = (nblocks, trips)
    pt_spec = pl.BlockSpec((vrows, LANE), lambda i, t: (t * nblocks + i, 0),
                           memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((vrows, LANE), lambda i, t: (i, 0),
                            memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((SUB, LANE), lambda i, t: (i, 0),
                            memory_space=pltpu.VMEM)
    t0_spec = pl.BlockSpec((1, 1), lambda i, t: (0, 0),
                           memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _accum_kernel,
        out_shape=[jax.ShapeDtypeStruct((nblocks * vrows, LANE),
                                        jnp.uint32)] * 3,
        grid=grid,
        in_specs=[t0_spec, pt_spec, pt_spec, cnt_spec,
                  acc_spec, acc_spec, acc_spec],
        out_specs=[acc_spec, acc_spec, acc_spec],
        interpret=interpret,
    )(t0_arr, pre_x, pre_y, counts_flat, *acc)
    return tuple(out)


# ---------------------------------------------------------------------------
# Host-side lane tiling: lane l of block b maps to (sublane l//LANE,
# lane l%LANE); limb i of a value occupies tile rows [i*SUB, (i+1)*SUB).
# ---------------------------------------------------------------------------


def _tile_value(arr):
    """uint32[..., LIMBS, RB] -> uint32[..., nb * LIMBS * SUB, LANE]."""
    *lead, limbs, rb = arr.shape
    nb = rb // BLOCK
    a = arr.reshape(*lead, limbs, nb, SUB, LANE)
    a = jnp.moveaxis(a, -3, -4)  # (..., nb, limbs, SUB, LANE)
    return a.reshape(*lead, nb * limbs * SUB, LANE)


def _untile_value(arr2d, rb: int):
    """uint32[nb * LIMBS * SUB, LANE] -> uint32[LIMBS, RB]."""
    nb = rb // BLOCK
    a = arr2d.reshape(nb, LIMBS, SUB, LANE)
    a = jnp.moveaxis(a, 0, 1)  # (LIMBS, nb, SUB, LANE)
    return a.reshape(LIMBS, rb)


def _tile_counts(counts_1rb):
    """int32[1, RB] -> int32[nb * SUB, LANE]."""
    rb = counts_1rb.shape[-1]
    return counts_1rb.reshape(rb // BLOCK * SUB, LANE)


# ---------------------------------------------------------------------------
# Host-side glue: canonical limb-major tables, pregather, RR conversion
# ---------------------------------------------------------------------------


def table_from_rr(points):
    """Projective RR table (from cv.from_affine_ints: z = 1, identity rows
    z = 0) -> (x16, y16) uint32[N, 16] canonical Montgomery affine coords.
    Identity rows become (0, 0) — they are only ever indexed masked-out
    (their scalars are 0, and digit-0 buckets are dropped by the plan)."""
    px, py, pz = points
    # The repack below is only correct for byte-valued AFFINE limbs. Every
    # MSM table is built by cv.from_affine_ints -> rr_from_host, which
    # yields canonical bytes; callers often WIDEN the static bound metadata
    # (with_bound never changes values), so the bound alone can't be
    # asserted here. The z = 1 assumption, however, IS checkable and its
    # silent violation was the round-4 k=21 off-curve bug (the projective
    # device SRS fed straight into the mixed-add kernel): sample rows and
    # fail loudly. Identity rows (z = 0) are fine — they are only ever
    # gathered count-masked.
    z_np = np.asarray(pz.limbs[:: max(1, pz.limbs.shape[0] // 64)])
    one = np.asarray(fr.FQ.one_mont)
    z_ok = ((z_np == one[None, :]).all(axis=1) | (z_np == 0).all(axis=1))
    if not z_ok.all():
        raise ValueError(
            "Pallas MSM table rows are PROJECTIVE (z != 1): the affine "
            "repack would silently corrupt the mixed add. Normalize the "
            "table first (prover/srs._affine_rr_limbs migrates legacy "
            "SRS caches).")

    def repack(rr):
        l = rr.limbs.astype(jnp.uint32)
        return l[..., 0::2] | (l[..., 1::2] << 8)

    return repack(px), repack(py)


def rr_from_acc(acc_xyz, shape, bound: int = 12):
    """Kernel accumulator (3 x uint32[16, RB]) -> projective RR tuple with
    limbs int32[*shape, 32] for the existing XLA bucket reduce. The bound
    defaults to ops/msm.py CARRY_BOUND (12): the reduce's fori_loop carries
    are pinned there, and a tighter input bound breaks carry pytree
    equality (bound is static aux data)."""
    out = []
    for comp in acc_xyz:
        c = jnp.transpose(comp, (1, 0))  # (RB, 16)
        lo = (c & 0xFF).astype(jnp.int32)
        hi = ((c >> 8) & 0xFF).astype(jnp.int32)
        limbs = jnp.stack([lo, hi], axis=-1).reshape(c.shape[0], 32)
        out.append(fr.RR(limbs.reshape(*shape, 32), bound))
    return tuple(out)


def _neg_y16_where(sign, y_rows):
    """where(sign, p - y, y) on (M, 16) canonical 16-bit limbs (uint32).

    16-step borrow chain, fully vectorized (static unroll). Intermediate
    uint32 wraparound encodes the borrow: each step's value fits
    [-(2^16), 2^16), so bit 16 of the wrapped result IS the borrow. y = 0
    (identity table rows) yields p — non-canonical, but identity rows are
    only ever gathered count-masked."""
    outs = []
    borrow = jnp.uint32(0)
    for i in range(LIMBS):
        t = jnp.uint32(_P_ROWS[i]) - y_rows[:, i] - borrow
        outs.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    neg = jnp.stack(outs, axis=1)
    return jnp.where(sign[:, None], neg, y_rows)


def pregather16(table_x, table_y, order, starts, t0, trips: int,
                row_window=None, signed: bool = False):
    """Gather `trips` steps' (R, B) affine points in one program, limb-major.

    Mirrors ops/msm.py `_pregather` (shared sorted order across a window's
    rows) but over the canonical (N, 16) tables; returns uint32[T, 16, RB]
    x2. The (N, 16) row gather is one contiguous 64-byte row per lane.

    signed=True consumes a signed-digit plan (ops/msm.host_bucket_plan
    signed=True): bit 31 of each order entry is the digit sign, folded here
    into a y -> p - y negation so the accumulate kernel needs no change."""
    n = table_x.shape[0]
    rows, nbuckets = starts.shape
    ts = t0 + jnp.arange(trips, dtype=jnp.int32)
    idx_sorted = jnp.clip(starts[None] + ts[:, None, None], 0, n - 1)
    idx_rows = jnp.transpose(idx_sorted, (1, 0, 2)).reshape(rows, -1)
    if row_window is None:
        point_idx = jnp.take_along_axis(order, idx_rows, axis=1)
    else:
        point_idx = order.reshape(-1)[
            row_window[:, None] * order.shape[1] + idx_rows]
    flat_raw = jnp.transpose(
        point_idx.reshape(rows, trips, nbuckets), (1, 0, 2)
    ).reshape(-1)
    if signed:
        flat_idx = flat_raw & jnp.int32(0x7FFFFFFF)
        sign_flat = flat_raw < 0
    else:
        flat_idx = flat_raw
        sign_flat = None
    rb = rows * nbuckets

    def g(tab, negate=False):
        rows_g = tab[flat_idx]                       # (T*RB, 16)
        if negate:
            rows_g = _neg_y16_where(sign_flat, rows_g)
        lm = jnp.transpose(rows_g.reshape(trips, rb, LIMBS), (0, 2, 1))
        return lm                                    # (T, LIMBS, RB)

    return g(table_x), g(table_y, negate=signed)


def _pad_rb(arr_2d, rb_pad):
    rb = arr_2d.shape[-1]
    if rb == rb_pad:
        return arr_2d
    pad = [(0, 0)] * (arr_2d.ndim - 1) + [(0, rb_pad - rb)]
    return jnp.pad(arr_2d, pad)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def msm_accumulate_pallas(points, order_np, starts_np, counts_np, weights,
                          trips_cap: int = 128,
                          interpret: bool | None = None,
                          signed: bool = False):
    """Bucket-accumulate via the fused kernel; returns the (R, B) projective
    RR accumulator for ops/msm.py bucket_reduce_logdepth."""
    acc, rb_pad = _accumulate_tiled(points, order_np, starts_np, counts_np,
                                    weights, trips_cap, interpret, signed)
    rows, nbuckets = counts_np.shape
    rb = rows * nbuckets
    acc = tuple(_untile_value(comp, rb_pad)[:, :rb] for comp in acc)
    return rr_from_acc(acc, (rows, nbuckets))


def msm_totals_pallas(points, order_np, starts_np, counts_np, weights,
                      trips_cap: int = 128,
                      interpret: bool | None = None,
                      signed: bool = False):
    """Accumulate + serial bucket reduce, both as VMEM kernels; returns the
    per-row projective totals (RR, shape (rows,)) for combine_rows_host.
    Replaces the XLA log-depth reduce (~0.16 s at 2^16 on HBM-materialized
    RR adds) with a ~B-step in-VMEM sweep."""
    acc, rb_pad = _accumulate_tiled(points, order_np, starts_np, counts_np,
                                    weights, trips_cap, interpret, signed)
    rows, nbuckets = counts_np.shape
    rb = rows * nbuckets
    nbr = max(1, -(-rows // BLOCK))
    nbr = 1 << max(0, nbr - 1).bit_length()
    r_pad = nbr * BLOCK
    blocks = []
    for comp in acc:
        v = _untile_value(comp, rb_pad)[:, :rb].reshape(LIMBS, rows, nbuckets)
        v = jnp.moveaxis(v, 2, 0)                        # (B, 16, R)
        v = _pad_rb(v, r_pad)
        blocks.append(_tile_value(v).reshape(-1, LANE))  # (B*nbr*128, LANE)
    tx_, ty_, tz_ = reduce_buckets_pallas(
        *blocks, nbuckets=nbuckets,
        interpret=(not _on_tpu()) if interpret is None else interpret,
        include_zero=signed)
    return rr_from_acc(
        tuple(_untile_value(t, r_pad)[:, :rows] for t in (tx_, ty_, tz_)),
        (rows,))


def _accumulate_tiled(points, order_np, starts_np, counts_np, weights,
                      trips_cap: int = 128,
                      interpret: bool | None = None,
                      signed: bool = False):
    """Shared accumulate driver; returns (tiled acc triple, rb_pad)."""
    if interpret is None:
        interpret = not _on_tpu()
    tx, ty = table_from_rr(points)
    rows, nbuckets = counts_np.shape
    rb = rows * nbuckets
    # pad the block count to a power of two: every distinct (nb, trips)
    # grid is a separate Mosaic compile (minutes each on a small host), and
    # the split plan's row count varies with scalar skew — pow2 rounding
    # bounds the set of compiled variants to a handful, cached persistently
    nb = ((rb + BLOCK - 1) // BLOCK)
    nb = 1 << max(0, nb - 1).bit_length()
    rb_pad = nb * BLOCK
    order = fo.np_to_dev(order_np)
    starts = jnp.asarray(starts_np)
    counts_flat = _tile_counts(_pad_rb(
        jnp.asarray(counts_np, dtype=jnp.int32).reshape(1, rb), rb_pad))
    row_window = None if weights is None else jnp.asarray(weights)

    max_load = int(counts_np.max()) if counts_np.size else 0
    acc = (
        jnp.zeros((nb * LIMBS * SUB, LANE), jnp.uint32),            # X = 0
        _tile_value(_pad_rb(jnp.broadcast_to(                       # Y = 1
            jnp.asarray(_mont_one16(), jnp.uint32)[:, None], (LIMBS, rb)),
            rb_pad)),
        jnp.zeros((nb * LIMBS * SUB, LANE), jnp.uint32),            # Z = 0
    )
    t = 0
    while t < max_load:
        pre_x, pre_y = pregather16(tx, ty, order, starts, jnp.int32(t),
                                   trips_cap, row_window, signed=signed)
        pre_x = _tile_value(_pad_rb(pre_x, rb_pad)).reshape(-1, LANE)
        pre_y = _tile_value(_pad_rb(pre_y, rb_pad)).reshape(-1, LANE)
        acc = accum_steps_pallas(pre_x, pre_y, counts_flat, acc,
                                 jnp.int32(t), trips_cap,
                                 interpret=interpret)
        t += trips_cap
    return acc, rb_pad


@functools.lru_cache(maxsize=1)
def _mont_one16() -> np.ndarray:
    one = fr.FQ.one_mont.astype(np.uint32)  # 32 byte limbs
    return one[0::2] | (one[1::2] << 8)
