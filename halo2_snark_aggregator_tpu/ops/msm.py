"""Pippenger multi-scalar multiplication on TPU (JAX).

The TPU-native replacement for the reference's MSM paths — the mock naive
fold (arith/ecc.rs:38-60) and the in-circuit `shamir` windowed MSM
(halo2-ecc-circuit-lib/src/chips/ecc_chip.rs:139-244) — redesigned for SIMD:

  * per-window digit extraction is a vectorized shift/mask;
  * points are sorted by bucket per window (one argsort), and buckets fill by
    iterating "one point per bucket per step" — all windows and all buckets
    advance in parallel, so the serial depth is the *maximum bucket load*,
    not N (`lax.while_loop` trips until every bucket drains);
  * point arithmetic uses the carry-free redundant field representation
    (ops/field_rr.py) with complete RCB projective formulas (ops/curve_rr.py)
    — zero comparisons / branches / carry scans in the hot loop;
  * bucket reduction is the classic two-accumulator running sum, batched over
    windows; window combination is c doublings per window plus one add.

`parallel/msm_shard.py` shards points across a device mesh and reduces the
per-device partial sums over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import curve_rr as cv
from . import field as fo
from . import field_rr as fr

# loop-carry limb bound for point coordinates (see field_rr.with_bound)
CARRY_BOUND = 12


def scalar_digits(scalars, c: int):
    """uint32[N, 16] 16-bit limbs -> int32[W, N] window digits (width c)."""
    nbits = fo.NBITS
    windows = (nbits + c - 1) // c
    digs = []
    for w in range(windows):
        lo_bit = w * c
        limb = lo_bit // fo.LIMB_BITS
        off = lo_bit % fo.LIMB_BITS
        v = scalars[:, limb] >> off
        if off + c > fo.LIMB_BITS and limb + 1 < fo.LIMBS:
            v = v | (scalars[:, limb + 1] << (fo.LIMB_BITS - off))
        digs.append(v & ((1 << c) - 1))
    return jnp.stack(digs).astype(jnp.int32)


def _pin(p):
    return tuple(fr.with_bound(comp, CARRY_BOUND) for comp in p)


def _varying_identity(ref: fr.RR, shape):
    """Identity points whose arrays derive from the (possibly sharded) input
    so loop-carry varying-axis types line up under shard_map."""
    vzero = jnp.broadcast_to(ref.limbs[0] & jnp.int32(0), shape + (fr.NLIMBS,))
    one = jnp.asarray(cv.FQ.one_mont)
    return _pin((
        fr.RR(vzero, CARRY_BOUND),
        fr.RR(vzero + one, CARRY_BOUND),
        fr.RR(vzero, CARRY_BOUND),
    ))


def host_bucket_plan(scalars_np: np.ndarray, c: int):
    """Host-side bucket planning (numpy): digit extraction, per-window sort,
    bucket starts/counts. Sorting on device (argsort + vmapped searchsorted)
    compiled for minutes and, combined with the accumulation loop, faulted
    the axon TPU worker; the plan is O(N log N) host work on int32s and
    overlaps with device compute in a pipeline."""
    n = scalars_np.shape[0]
    nbits = fo.NBITS
    windows = (nbits + c - 1) // c
    mask = (1 << c) - 1
    digits = np.zeros((windows, n), dtype=np.int64)
    vals = scalars_np.astype(np.int64)
    for w in range(windows):
        lo_bit = w * c
        limb = lo_bit // fo.LIMB_BITS
        off = lo_bit % fo.LIMB_BITS
        v = vals[:, limb] >> off
        if off + c > fo.LIMB_BITS and limb + 1 < fo.LIMBS:
            v = v | (vals[:, limb + 1] << (fo.LIMB_BITS - off))
        digits[w] = v & mask
    order = np.argsort(digits, axis=1, kind="stable").astype(np.int32)
    sorted_digits = np.take_along_axis(digits, order, axis=1)
    bucket_ids = np.arange(1 << c)
    starts = np.stack([
        np.searchsorted(sorted_digits[w], bucket_ids, side="left")
        for w in range(windows)
    ]).astype(np.int32)
    ends = np.stack([
        np.searchsorted(sorted_digits[w], bucket_ids, side="right")
        for w in range(windows)
    ]).astype(np.int32)
    counts = (ends - starts).astype(np.int32)
    counts[:, 0] = 0  # digit 0 contributes nothing
    return order, starts, counts


def _bucket_accumulate(points, order, starts, counts, c: int):
    px, py, pz = points
    n = px.limbs.shape[0]
    nbuckets = 1 << c
    windows = order.shape[0]
    max_load = jnp.max(counts)

    acc = _varying_identity(px, (windows, nbuckets))

    def cond(state):
        t, _ = state
        return t < max_load

    def body(state):
        t, acc = state
        idx_sorted = jnp.clip(starts + t, 0, n - 1)  # (W, B)
        point_idx = jnp.take_along_axis(order, idx_sorted, axis=1)
        pt = cv.gather_point((px, py, pz), point_idx)  # (W, B, 32) limbs
        new = cv.add(acc, pt)
        valid = t < counts
        acc = _pin(cv.select_point(valid, new, acc))
        return t + 1, acc

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc


def _bucket_reduce(acc, c: int):
    nbuckets = 1 << c
    windows = acc[0].limbs.shape[0]

    def red_body(i, state):
        running, total = state
        b = nbuckets - 1 - i
        bucket = tuple(fr.RR(comp.limbs[:, b], comp.bound) for comp in acc)
        running = _pin(cv.add(running, bucket))
        total = _pin(cv.add(total, running))
        return running, total

    ref = fr.RR(acc[0].limbs[:, 0], acc[0].bound)
    running = _varying_identity(ref, (windows,))
    total = _varying_identity(ref, (windows,))
    _running, total = jax.lax.fori_loop(0, nbuckets - 1, red_body, (running, total))
    return total


def _combine_windows(total, c: int):
    windows = total[0].limbs.shape[0]

    def comb_body(i, res):
        w = windows - 1 - i
        for _ in range(c):
            res = _pin(cv.double(res))
        return _pin(cv.add(res, cv.gather_point(total, w)))

    res = _pin(cv.gather_point(total, windows - 1))
    return jax.lax.fori_loop(1, windows, comb_body, res)


@functools.partial(jax.jit, static_argnames=("c",))
def msm_planned(points, order, starts, counts, c: int = 8):
    """MSM with a host-computed bucket plan, single fused program (for use
    inside larger jitted computations; takes (order, starts, counts) from
    host_bucket_plan as device operands)."""
    acc = _bucket_accumulate(points, order, starts, counts, c)
    total = _bucket_reduce(acc, c)
    return _combine_windows(total, c)


def msm(points, scalars, c: int = 8):
    """MSM: sum_i scalars[i] * points[i].

    points: projective triple of field_rr.RR with limbs int32[N, 32].
    scalars: uint32[N, 16] standard-form Fr limbs (host numpy or device; the
    bucket plan is computed host-side). Returns a single projective RR point.
    """
    order, starts, counts = host_bucket_plan(np.asarray(scalars), c)
    return msm_planned(points, jnp.asarray(order), jnp.asarray(starts),
                       jnp.asarray(counts), c=c)


_accum_jit = functools.partial(jax.jit, static_argnames=("c",))(_bucket_accumulate)
_reduce_jit = functools.partial(jax.jit, static_argnames=("c",))(_bucket_reduce)
_combine_jit = functools.partial(jax.jit, static_argnames=("c",))(_combine_windows)


@functools.partial(jax.jit, static_argnames=("trips",))
def _accum_steps(points, order, starts, counts, acc, t0, trips: int):
    """`trips` accumulate steps starting at step t0 (a traced scalar, so one
    compile covers the whole sweep). Out-of-range steps are masked by the
    per-bucket counts, exactly as in _bucket_accumulate."""
    px, py, pz = points
    n = px.limbs.shape[0]

    def body(i, acc):
        t = t0 + i
        idx_sorted = jnp.clip(starts + t, 0, n - 1)
        point_idx = jnp.take_along_axis(order, idx_sorted, axis=1)
        pt = cv.gather_point((px, py, pz), point_idx)
        new = cv.add(acc, pt)
        valid = t < counts
        return _pin(cv.select_point(valid, new, acc))

    return jax.lax.fori_loop(0, trips, body, acc)


@functools.partial(jax.jit, static_argnames=())
def _accum_init(px_ref, windows_buckets):
    return _varying_identity(px_ref, tuple(windows_buckets.shape))


def msm_staged_bounded(points, scalars, c: int = 8, trips: int = 256):
    """msm_staged with the bucket-accumulate phase driven from the host in
    bounded slices of `trips` steps per program. At 4M points the max bucket
    load is ~n/2^c (~16k) — a single while_loop program of that many
    sequential point-adds runs for minutes and gets the axon worker killed
    ('kernel fault'); ~256-trip programs stay well under the limit."""
    order, starts, counts_np = None, None, None
    order_np, starts_np, counts_np = host_bucket_plan(np.asarray(scalars), c)
    max_load = int(counts_np.max()) if counts_np.size else 0
    order = jnp.asarray(order_np)
    starts = jnp.asarray(starts_np)
    counts = jnp.asarray(counts_np)
    windows = order_np.shape[0]
    acc = _accum_init(points[0], np.zeros((windows, 1 << c)))
    t = 0
    while t < max_load:
        acc = _accum_steps(points, order, starts, counts, acc,
                           jnp.int32(t), trips)
        t += trips
    total = _reduce_jit(acc, c=c)
    return _combine_jit(total, c=c)


def msm_staged(points, scalars, c: int = 8):
    """Host bucket plan + three separately-jitted device phases
    (intermediates stay on device; most robust on the axon backend)."""
    order, starts, counts = host_bucket_plan(np.asarray(scalars), c)
    acc = _accum_jit(points, jnp.asarray(order), jnp.asarray(starts),
                     jnp.asarray(counts), c=c)
    total = _reduce_jit(acc, c=c)
    return _combine_jit(total, c=c)


def msm_host(points_int, scalars_int, c: int = 8):
    """Convenience host wrapper: int points/scalars -> int affine result.

    Pads N to the next power of two (identity points, zero scalars) so the
    jitted kernel compiles for a bounded set of shapes."""
    if not points_int:
        return None
    n = len(points_int)
    padded = 1 << max(3, (n - 1).bit_length())
    pts = list(points_int) + [None] * (padded - n)
    scals = [s % fo.FR.modulus for s in scalars_int] + [0] * (padded - n)
    jpts = _pin(cv.from_affine_ints(pts))
    jscal = jnp.asarray(fo.ints_to_limbs(scals))
    out = msm_staged(jpts, jscal, c=c)
    host = tuple(fr.RR(np.asarray(comp.limbs)[None], comp.bound) for comp in out)
    return cv.to_affine_ints(host)[0]
