"""Pippenger multi-scalar multiplication on TPU (JAX).

The TPU-native replacement for the reference's MSM paths — the mock naive
fold (arith/ecc.rs:38-60) and the in-circuit `shamir` windowed MSM
(halo2-ecc-circuit-lib/src/chips/ecc_chip.rs:139-244) — redesigned for SIMD:

  * per-window digit extraction is a vectorized shift/mask;
  * points are sorted by bucket per window (one argsort), and buckets are
    filled by iterating "one point per bucket per step" — all windows and all
    buckets advance in parallel, so the serial depth is the *maximum bucket
    load*, not N (branch-free, static shapes; `lax.while_loop` trips until
    every bucket is drained);
  * bucket reduction is the classic two-accumulator running sum, batched over
    windows;
  * window combination is c doublings per window plus one add.

`msm_sharded` in parallel/msm_shard.py shards windows across a device mesh
and reduces partial window sums with ICI collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as cv
from . import field as fo


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


@functools.partial(jax.jit, static_argnames=("c",))
def msm(points, scalars, c: int = 8):
    """MSM: sum_i scalars[i] * points[i].

    points: Jacobian triple of uint32[N, 16] (Montgomery Fq).
    scalars: uint32[N, 16] standard-form Fr limbs.
    Returns a Jacobian point (single element).
    """
    px, py, pz = points
    n = px.shape[0]
    nbuckets = 1 << c
    digits = scalar_digits(scalars, c)  # (W, N)
    windows = digits.shape[0]

    # sort point indices by digit per window
    order = jnp.argsort(digits, axis=1)  # (W, N)
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)

    # bucket start offsets + counts per window via searchsorted
    bucket_ids = jnp.arange(nbuckets, dtype=jnp.int32)
    starts = jax.vmap(lambda row: jnp.searchsorted(row, bucket_ids, side="left"))(
        sorted_digits
    )  # (W, B)
    ends = jax.vmap(lambda row: jnp.searchsorted(row, bucket_ids, side="right"))(
        sorted_digits
    )
    counts = ends - starts
    counts = counts.at[:, 0].set(0)  # digit 0 contributes nothing
    max_load = jnp.max(counts)

    def _varying_point(shape):
        """Identity points whose arrays derive from the (possibly sharded)
        inputs, so loop-carry varying-axis types line up under shard_map."""
        vzero = jnp.broadcast_to(px[0] & jnp.uint32(0), shape + (fo.LIMBS,))
        one = jnp.asarray(fo.FQ.one_mont)
        return (vzero + one, vzero + one, vzero)

    acc = _varying_point((windows, nbuckets))

    def cond(state):
        t, _ = state
        return t < max_load

    def body(state):
        t, acc = state
        idx_sorted = jnp.clip(starts + t, 0, n - 1)  # (W, B)
        point_idx = jnp.take_along_axis(
            jnp.broadcast_to(order, (windows, n)), idx_sorted, axis=1
        )  # (W, B)
        bx = px[point_idx]  # (W, B, 16)
        by = py[point_idx]
        bz = pz[point_idx]
        valid = t < counts  # (W, B)
        new = cv.add(acc, (bx, by, bz))
        acc = cv.select_point(valid, new, acc)
        return t + 1, acc

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))

    # bucket reduction: S_w = sum_b b * bucket[w, b]
    def red_body(i, state):
        running, total = state
        b = nbuckets - 1 - i
        bucket = tuple(a[:, b] for a in acc)
        running = cv.add(running, bucket)
        total = cv.add(total, running)
        return running, total

    running = _varying_point((windows,))
    total = _varying_point((windows,))
    running, total = jax.lax.fori_loop(0, nbuckets - 1, red_body, (running, total))

    # window combination: result = sum_w 2^(c*w) S_w, highest window first
    def comb_body(i, res):
        w = windows - 1 - i
        for _ in range(c):
            res = cv.double(res)
        return cv.add(res, tuple(a[w] for a in total))

    # first window (highest) without the doubling prefix:
    res = tuple(a[windows - 1] for a in total)
    res = jax.lax.fori_loop(1, windows, lambda i, r: comb_body(i, r), res)
    return res


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
    jpts = cv.from_affine_ints(pts)
    jscal = jnp.asarray(fo.ints_to_limbs(scals))
    out = msm(jpts, jscal, c=c)
    return cv.to_affine_ints(tuple(np.asarray(a)[None] for a in out))[0]
