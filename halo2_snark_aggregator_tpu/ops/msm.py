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
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from . import curve_rr as cv
from . import field as fo
from . import field_rr as fr
from ..ff import bn254 as ff

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
    base = ref.limbs.reshape(-1, fr.NLIMBS)[0]  # one limb vector
    vzero = jnp.broadcast_to(base & jnp.int32(0), shape + (fr.NLIMBS,))
    one = jnp.asarray(cv.FQ.one_mont)
    return _pin((
        fr.RR(vzero, CARRY_BOUND),
        fr.RR(vzero + one, CARRY_BOUND),
        fr.RR(vzero, CARRY_BOUND),
    ))


def signed_recode(digits: np.ndarray, c: int):
    """Unsigned window digits (W, N) -> signed-digit recoding (mags, signs).

    d'_w = d_w + carry in (-(2^(c-1)-1) .. 2^(c-1)]: digits above half the
    window range borrow from the next window (sum_w 2^(cw) d'_w invariant).
    Halves the live bucket range: |d'| <= 2^(c-1), so a signed plan needs
    2^(c-1)+1 bucket slots instead of 2^c (the classic signed-digit
    Pippenger trick; the sign rides into the accumulate as a y-negation).
    Requires headroom in the top window (true for 254-bit scalars at c=8:
    top digit <= 63) — asserts no final carry escapes."""
    half = 1 << (c - 1)
    full = 1 << c
    mags = np.empty_like(digits)
    signs = np.empty(digits.shape, dtype=np.int32)
    carry = np.zeros(digits.shape[1], dtype=digits.dtype)
    for w in range(digits.shape[0]):
        d = digits[w] + carry
        flip = d > half
        carry = flip.astype(digits.dtype)
        sd = np.where(flip, d - full, d)
        mags[w] = np.abs(sd)
        signs[w] = (sd < 0).astype(np.int32)
    assert not carry.any(), "signed recode overflowed the top window"
    return mags, signs


def host_bucket_plan(scalars_np: np.ndarray, c: int, signed: bool = False):
    """Host-side bucket planning (numpy): digit extraction, per-window sort,
    bucket starts/counts. Sorting on device (argsort + vmapped searchsorted)
    compiled for minutes and, combined with the accumulation loop, faulted
    the axon TPU worker; the plan is O(N log N) host work on int32s and
    overlaps with device compute in a pipeline."""
    n = scalars_np.shape[0]
    nbits = fo.NBITS
    windows = (nbits + c - 1) // c
    mask = (1 << c) - 1
    if c == 8:
        # the production window width: digit w IS byte w of the scalar —
        # a zero-arithmetic view of the 16-bit limbs' little-endian bytes
        digits = np.ascontiguousarray(
            scalars_np.astype(np.uint16, order="C").view(np.uint8).T
        ).astype(np.int64)
    else:
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
    signs = None
    if signed:
        digits, signs = signed_recode(digits, c)
        # SHIFTED slot layout: slot s holds magnitude s+1 (mag 0 drops out
        # before slot 0's start), so the bucket axis is 2^(c-1) — a power
        # of two, keeping the Pallas lane blocks pow2 (129 slots would
        # round the block grid UP 2x). Totals are sum_s (s+1)*S_s: the
        # serial reduce includes slot 0 in its sweep (include_zero).
        nbuckets = 1 << (c - 1)
    else:
        nbuckets = 1 << c
    # per-ROW narrow-int argsort: numpy dispatches 1-D stable integer sorts
    # to an O(N) radix sort, but NOT the axis=1 2-D form (measured 14x
    # slower at 2^20); uint8/uint16 keys make the radix passes cheap
    assert c <= 14, "digit must fit int16 for the radix argsort"
    small = digits.astype(np.uint8 if digits.max(initial=0) < 256
                          else np.uint16)
    order = np.stack([
        np.argsort(small[w], kind="stable") for w in range(windows)
    ]).astype(np.int32)
    sorted_digits = np.take_along_axis(digits, order, axis=1)
    # signed: slot s <- magnitude s+1 (shifted); unsigned: slot b <- digit b
    bucket_ids = np.arange(1, nbuckets + 1) if signed else np.arange(nbuckets)
    starts = np.stack([
        np.searchsorted(sorted_digits[w], bucket_ids, side="left")
        for w in range(windows)
    ]).astype(np.int32)
    ends = np.stack([
        np.searchsorted(sorted_digits[w], bucket_ids, side="right")
        for w in range(windows)
    ]).astype(np.int32)
    counts = (ends - starts).astype(np.int32)
    if not signed:
        counts[:, 0] = 0  # digit 0 contributes nothing
    if signed:
        # pack each point's per-window digit sign into bit 31 of its order
        # entry; consumers that understand signed plans (msm_pallas
        # pregather16) decode idx = e & 0x7FFFFFFF, sign = e < 0 and fold
        # the sign into a base-field y-negation at gather time
        sign_sorted = np.take_along_axis(signs, order, axis=1)
        order = (order | (sign_sorted << 31)).astype(np.int32)
    return order, starts, counts


def host_bucket_plan_split(scalars_np: np.ndarray, c: int,
                           target: int | None = None,
                           signed: bool = False):
    """Load-balanced bucket plan: like host_bucket_plan, but any window whose
    max bucket load exceeds `target` is split into several accumulator ROWS
    (equal ranges of its digit-sorted point list), each carrying the window's
    weight. The accumulate phase's serial depth becomes ~target regardless of
    the scalar distribution — the plain plan degrades badly whenever digits
    are skewed (the TOP window of a 254-bit scalar has only a few meaningful
    bits, so its 2^c buckets collapse onto a handful: measured max_load
    20635 at c=12 / N=2^16 vs the ~16 a uniform window would give).

    Returns (order (W, N), starts (R, B), counts (R, B), weights (R,)) where
    weights[r] is the window index of row r (it doubles as the row's index
    into `order` — rows of one window share the window's sorted order, so
    order is NOT duplicated per row: at 2^20/target=128 the per-row stack
    was a 4 GiB device array and dominated the whole MSM through the
    host->device tunnel). Combine with combine_rows_host(totals, weights, c).
    """
    n = scalars_np.shape[0]
    if target is None:
        # ~half the uniform per-bucket load: halves the trip count while
        # keeping row count (VPU batch width) moderate
        target = max(64, (n >> c) // 2)
    base_order, base_starts, base_counts = host_bucket_plan(
        scalars_np, c, signed=signed)
    windows = base_order.shape[0]

    # Bound the TOTAL row count: skewed scalar distributions (the prover's
    # polynomial coefficients pile most digits into a few buckets — unlike
    # the bench's uniform scalars) can push R into the tens of thousands,
    # and the accumulate wavefront's (R, B) CIOS temps then blow the HBM
    # compile estimate (observed: R=16384 at c=8 -> XLA "Used 102.00G of
    # 15.75G hbm" permanent compile error — the silent round-2 headline
    # killer). Doubling `target` halves each window's row count: width is
    # traded for serial depth, which the staged trip dispatches already
    # bound. 1024 rows ~ 6.4G estimated live temps on a 16G v5e.
    rows_cap = max(int(os.environ.get("H2T_MSM_ROWS_CAP", "1024")), windows)
    maxcs = [int(base_counts[w].max()) if base_counts[w].size else 0
             for w in range(windows)]
    target_in = target
    while sum(max(1, -(-m // target)) for m in maxcs) > rows_cap:
        target *= 2
    if target != target_in:
        # an explicitly-passed target (e.g. a pinned A/B leg) was raised by
        # the cap: say so, or the bench artifact's label lies (advisor r3)
        print(f"msm split plan: rows cap {rows_cap} raised target "
              f"{target_in} -> {target} (n={n}, c={c})", file=sys.stderr)

    # per-BUCKET segment split: row r of window w holds points
    # [start_b + r*target, start_b + min((r+1)*target, count_b)) of every
    # bucket b, so every (row, bucket) load is <= target exactly; all rows
    # of a window share its sorted order array
    rows_starts, rows_counts, weights = [], [], []
    for w in range(windows):
        maxc = int(base_counts[w].max()) if base_counts[w].size else 0
        nrows = max(1, -(-maxc // target))
        b_start = base_starts[w].astype(np.int64)
        b_count = base_counts[w].astype(np.int64)
        for r in range(nrows):
            off = r * target
            cnt = np.clip(b_count - off, 0, target)
            rows_starts.append((b_start + off).astype(np.int32))
            rows_counts.append(cnt.astype(np.int32))
            weights.append(w)

    starts = np.stack(rows_starts)
    counts = np.stack(rows_counts)
    weights = np.asarray(weights, dtype=np.int32)

    # Pad the row count UP to a power of two (zero-count rows: every trip is
    # masked off, and identity row totals vanish in combine_rows_host). The
    # accumulate program's compiled shape is (R, B): without padding, every
    # distinct scalar skew yields a distinct R and therefore a fresh
    # multi-minute XLA (or Mosaic) compile — the accel prover's keygen
    # commits dozens of fixed columns with dozens of distinct skews, which
    # is how the round-3 driver bench burned its whole window compiling.
    # Pow2 rounding collapses the variant set to {windows.., 1024}.
    r = starts.shape[0]
    r_pad = 1 << max(0, r - 1).bit_length()
    if r_pad != r:
        pad = r_pad - r
        starts = np.concatenate(
            [starts, np.zeros((pad, starts.shape[1]), starts.dtype)])
        counts = np.concatenate(
            [counts, np.zeros((pad, counts.shape[1]), counts.dtype)])
        weights = np.concatenate([weights, np.zeros(pad, np.int32)])
    return base_order, starts, counts, weights


def combine_rows_host(totals, weights: np.ndarray, c: int):
    """Host finish for a split plan: totals is the (R,) projective RR row
    totals; result = sum_r 2^(c*weights[r]) * T_r (rows of one window share
    the weight) — one host Pippenger call (native fast path when loaded)."""
    host = tuple(fr.RR(np.asarray(comp.limbs), comp.bound) for comp in totals)
    pts = cv.to_affine_ints(host)
    entries = [(p, pow(2, c * int(weights[r]), ff.R))
               for r, p in enumerate(pts) if p is not None]
    if not entries:
        return None
    return ff.g1_msm([p for p, _ in entries], [s for _, s in entries])


def msm_staged_split(points, scalars, c: int = 8, trips: int = 256,
                     target: int | None = None, prefetch: bool | None = None,
                     accum: str | None = None, signed: bool | None = None):
    """Load-balanced staged MSM: split bucket plan -> bounded accumulate
    dispatches -> log-depth bucket reduce -> host window combine. The right
    default for commit-size N on the real chip: serial depth ~target for
    ANY scalar distribution, all phases restartable dispatches.

    prefetch=True (the default; H2T_MSM_PREFETCH=0 disables) swaps the
    loop-carried per-trip gather for one up-front gather per dispatch
    (_accum_steps_pregather), with the per-dispatch trip count capped so the
    prefetched point buffer stays bounded. Measured on a real v5e at 2^16
    points, c=8: 39.4k pts/s pregathered vs 26.4k loop-gathered (+50% —
    the per-trip gather serializes behind the previous add; see CLAUDE.md
    gather rule). Wider windows lose: c=10 measured 6x SLOWER (rows*buckets
    device width blows up faster than serial depth shrinks) and c=12
    OOMs HBM at 2^16.

    accum='tree' (or H2T_MSM_ACCUM=tree) further replaces the pregathered
    dispatch's serial fold with the log-depth tree of _accum_steps_tree."""
    import os

    # Explicit arguments take precedence over ambient env knobs; the env is
    # consulted only when the caller left BOTH accum and prefetch unset.
    if accum is None and prefetch is not None:
        accum = "pre" if prefetch else "loop"
    if accum is None:
        accum = os.environ.get("H2T_MSM_ACCUM", "") or None
    if accum is None and os.environ.get("H2T_MSM_PREFETCH"):
        accum = ("pre" if int(os.environ["H2T_MSM_PREFETCH"])
                 else "loop")
    if accum is None:
        # default: the fused Pallas accumulate on real TPU (2.8x the XLA
        # pregather path at 2^16, BENCH_MSM_r03.json); the XLA pregather
        # path elsewhere (CPU interpret-mode of the kernel is impractical
        # to compile — see ops/msm_pallas.py)
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        accum = "pallas" if on_tpu else "pre"
    signed_explicit = signed is not None
    if signed is None:
        env_signed = os.environ.get("H2T_MSM_SIGNED")
        signed = bool(int(env_signed)) if env_signed else False
    if signed and accum != "pallas":
        # only the Pallas pregather decodes the bit-31 sign packing; the
        # XLA accum paths would gather garbage indices
        if signed_explicit:
            # say so, or an A/B leg labeled 'signed' silently measures the
            # unsigned path (same label-lies hazard as the rows-cap raise)
            print(f"msm: signed=True dropped (accum={accum!r} cannot decode "
                  f"the sign packing; only accum='pallas' can)",
                  file=sys.stderr)
        signed = False
    order_np, starts_np, counts_np, weights = host_bucket_plan_split(
        np.asarray(scalars), c, target, signed=signed)
    if accum == "pallas":
        # fused-VMEM bucket accumulate (ops/msm_pallas.py): the XLA limb
        # path is HBM-bound on materialized CIOS temps; the kernel keeps
        # the accumulator and every mul temp on-chip
        from . import msm_pallas as mp

        rb = int(np.prod(counts_np.shape)) or 1
        # the Pallas kernel consumes the pregather buffer block-by-block
        # with no XLA fusion temps around it, so the budget can be far more
        # generous than the XLA path's; still shrink under a >1 GiB table
        # (2^22: table + order already ~1 GiB resident)
        pts_bytes = int(points[0].limbs.shape[0]) * 3 * fr.NLIMBS * 4
        default_budget = 29 if pts_bytes < (1 << 30) else 27
        budget = 1 << int(os.environ.get("H2T_MSM_BUDGET_LOG2",
                                         str(default_budget)))
        # cap trips by the pregather HBM budget AND the (power-of-2 rounded,
        # to bound the set of Mosaic compiles) max bucket load
        load_cap = 1 << max(0, int(counts_np.max()) - 1).bit_length() \
            if counts_np.size else 1
        cap = max(1, min(512, load_cap, budget // (rb * 2 * 16 * 4)))
        cap = 1 << (cap.bit_length() - 1)  # pow2: bounds compile variants
        if mp._on_tpu():
            totals = mp.msm_totals_pallas(points, order_np, starts_np,
                                          counts_np, weights, trips_cap=cap,
                                          signed=signed)
        else:
            # interpret-mode reduce is impractical to compile on CPU; the
            # XLA log-depth reduce covers the fallback path
            acc = mp.msm_accumulate_pallas(points, order_np, starts_np,
                                           counts_np, weights,
                                           trips_cap=cap, signed=signed)
            if signed:
                # shifted slot layout (slot s = magnitude s+1): prepend an
                # identity column so the reduce's sum_b b*S_b weights slot
                # s as s+1
                ident = _varying_identity(acc[0], (acc[0].limbs.shape[0], 1))
                acc = tuple(
                    fr.RR(jnp.concatenate([ic.limbs, comp.limbs], axis=1),
                          comp.bound)
                    for ic, comp in zip(ident, acc))
            totals = bucket_reduce_logdepth(acc, c=c)
        return combine_rows_host(totals, weights, c)
    max_load = int(counts_np.max()) if counts_np.size else 0
    # (W, N), shared across each window's rows; bounded-slice upload (one
    # 512 MB transfer at 2^22 RESOURCE_EXHAUSTs the axon tunnel)
    order = fo.np_to_dev(order_np)
    starts = jnp.asarray(starts_np)
    counts = jnp.asarray(counts_np)
    row_window = jnp.asarray(weights)
    acc = _accum_init(points[0], np.zeros(counts_np.shape))
    step_cap = trips
    step_fn = _accum_steps
    if accum in ("pre", "tree"):
        rows = int(np.prod(counts_np.shape)) or 1
        # XLA's fusions around the prefetched buffer materialize temps ~4x
        # its size; with a >1 GiB point table also resident (2^22: 1.6 GiB
        # SRS + 0.5 GiB order) the 256 MiB prefetch budget OOMed 16 GiB HBM,
        # so shrink it when the table is large
        pts_bytes = int(points[0].limbs.shape[0]) * 3 * fr.NLIMBS * 4
        budget = (1 << 28) if pts_bytes < (1 << 30) else (1 << 26)
        if accum == "tree":
            # the tree additionally materializes the identity-masked
            # (T, R, B) leaf level + per-level fold temps on top of the
            # prefetch buffer; derate so peak HBM stays within the
            # pregather-calibrated margin
            budget //= 2
        env_budget = os.environ.get("H2T_MSM_BUDGET_LOG2")
        if env_budget:
            budget = 1 << int(env_budget)
        step_cap = max(1, min(trips, budget // (rows * 3 * fr.NLIMBS * 4)))
        step_fn = (_accum_steps_pregather if accum == "pre"
                   else _accum_steps_tree)
    elif accum != "loop":
        raise ValueError(f"unknown accum mode {accum!r}")
    t = 0
    while t < max_load:
        # ALWAYS dispatch step_cap trips: a partial final dispatch would
        # compile a distinct program per remainder size (each commit in the
        # accel prover has its own max_load -> dozens of multi-minute XLA
        # compiles); overshoot trips are masked by the per-bucket counts
        acc = step_fn(points, order, starts, counts, acc, jnp.int32(t),
                      step_cap, row_window=row_window)
        t += step_cap
    totals = bucket_reduce_logdepth(acc, c=c)
    return combine_rows_host(totals, weights, c)


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


def _plan_point_idx(order, starts, t, n, row_window=None):
    """Resolve trip t's (R, B) point indices. With a split plan, `order` is
    (W, N) shared across each window's rows and row_window maps row -> w
    (indexing through it avoids materializing the (R, N) per-row stack —
    4 GiB at 2^20/target=128)."""
    idx_sorted = jnp.clip(starts + t, 0, n - 1)
    if row_window is None:
        return jnp.take_along_axis(order, idx_sorted, axis=1)
    flat = order.reshape(-1)
    return flat[row_window[:, None] * order.shape[1] + idx_sorted]


@functools.partial(jax.jit, static_argnames=("trips",))
def _accum_steps(points, order, starts, counts, acc, t0, trips: int,
                 row_window=None):
    """`trips` accumulate steps starting at step t0 (a traced scalar, so one
    compile covers the whole sweep). Out-of-range steps are masked by the
    per-bucket counts, exactly as in _bucket_accumulate."""
    px, py, pz = points
    n = px.limbs.shape[0]

    def body(i, acc):
        t = t0 + i
        point_idx = _plan_point_idx(order, starts, t, n, row_window)
        pt = cv.gather_point((px, py, pz), point_idx)
        new = cv.add(acc, pt)
        valid = t < counts
        return _pin(cv.select_point(valid, new, acc))

    return jax.lax.fori_loop(0, trips, body, acc)


@functools.partial(jax.jit, static_argnames=())
def _accum_init(px_ref, windows_buckets):
    return _varying_identity(px_ref, tuple(windows_buckets.shape))


def _pregather(points, order, starts, counts, t0, trips: int,
               row_window=None):
    """Fetch ALL `trips` steps' (R, B) points in ONE gather. The loop-carried
    gather in _accum_steps issues one (R, B)-row gather per trip, serialized
    behind the previous add; here a single (trips*R*B)-row gather runs up
    front (one big DMA program XLA can pipeline). Costs trips*R*B*384B of
    HBM — callers bound `trips` accordingly (msm_staged_split caps the
    prefetch working set)."""
    px, py, pz = points
    n = px.limbs.shape[0]
    rows, nbuckets = starts.shape

    ts = t0 + jnp.arange(trips, dtype=jnp.int32)
    idx_sorted = jnp.clip(starts[None] + ts[:, None, None], 0, n - 1)
    # order rows are shared across trips: gather along the point axis with a
    # (R, trips*B) index block instead of broadcasting order to (T, R, N)
    idx_rows = jnp.transpose(idx_sorted, (1, 0, 2)).reshape(rows, -1)
    if row_window is None:
        point_idx = jnp.take_along_axis(order, idx_rows, axis=1)
    else:
        point_idx = order.reshape(-1)[
            row_window[:, None] * order.shape[1] + idx_rows]
    flat_idx = jnp.transpose(
        point_idx.reshape(rows, trips, nbuckets), (1, 0, 2)
    ).reshape(-1)
    return tuple(
        fr.RR(comp.limbs[flat_idx].reshape(trips, rows, nbuckets, fr.NLIMBS),
              comp.bound)
        for comp in (px, py, pz)
    )


@functools.partial(jax.jit, static_argnames=("trips",))
def _accum_steps_pregather(points, order, starts, counts, acc, t0,
                           trips: int, row_window=None):
    """_accum_steps with the points prefetched (_pregather); the loop body
    reads contiguous dynamic slices of the prefetched buffer."""
    pre = _pregather(points, order, starts, counts, t0, trips, row_window)

    def body(i, acc):
        t = t0 + i
        pt = tuple(
            fr.RR(jax.lax.dynamic_index_in_dim(comp.limbs, i, axis=0,
                                               keepdims=False), comp.bound)
            for comp in pre
        )
        new = cv.add(acc, pt)
        valid = t < counts
        return _pin(cv.select_point(valid, new, acc))

    return jax.lax.fori_loop(0, trips, body, acc)


def _slice_t(p, a: int, b: int):
    return tuple(fr.RR(comp.limbs[a:b], comp.bound) for comp in p)


@functools.partial(jax.jit, static_argnames=("trips",))
def _accum_steps_tree(points, order, starts, counts, acc, t0,
                      trips: int, row_window=None):
    """Pregathered accumulate with a LOG-DEPTH reduction. Bucket addition is
    associative, so the `trips` points destined for each (row, bucket) need
    not fold serially: leaves past a bucket's count are masked to the
    identity (the RCB formulas are complete, identity included) and the
    (T, R, B) block tree-folds in ceil(log2 T) add levels plus one add into
    `acc`. Same total adds as the serial loop, serial depth log2(T)+1
    instead of T — the pregather A/B (BENCH_MSM_AB_r02.json) showed the
    accumulate is latency-bound on the add chain, not throughput-bound."""
    pre = _pregather(points, order, starts, counts, t0, trips, row_window)
    ts = t0 + jnp.arange(trips, dtype=jnp.int32)
    valid = ts[:, None, None] < counts[None]  # (T, R, B)
    ident = _varying_identity(pre[0], tuple(pre[0].limbs.shape[:-1]))
    lvl = _pin(cv.select_point(valid, pre, ident))
    t = trips
    while t > 1:
        half = t // 2
        folded = _pin(cv.add(_slice_t(lvl, 0, half),
                             _slice_t(lvl, half, 2 * half)))
        if t % 2:
            folded = tuple(
                fr.RR(jnp.concatenate([f.limbs, comp.limbs[2 * half:]]),
                      max(f.bound, comp.bound))
                for f, comp in zip(folded, lvl)
            )
        lvl = folded
        t = half + (t % 2)
    top = tuple(fr.RR(comp.limbs[0], comp.bound) for comp in lvl)
    return _pin(cv.add(acc, top))


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


# ---------------------------------------------------------------------------
# Log-depth small/medium-N path: segmented-scan bucket sums + host finish.
#
# The while_loop accumulate + serial two-accumulator reduce + serial window
# combine have serial depth ~ max_load + 2*2^c + (256-c) point ops; at the
# verifier's MSM sizes (2^11-2^14) that is pure latency (measured 444 ms for
# N=2048 on v5e). This path instead:
#   * gathers the per-window sorted points once, then computes bucket sums
#     with ONE segmented associative scan over the point axis — depth
#     2*log2(N), each level a (W, N)-batched complete add (full VPU
#     utilization, static shapes, no data-dependent while_loop);
#   * reduces buckets to per-window totals with a suffix associative scan +
#     tree sum — depth ~3*log2(2^c);
#   * finishes the window combination ON HOST (the 248 serial doublings are
#     sub-ms in host bigints, and callers materialize the result anyway).
# ---------------------------------------------------------------------------


def _padd(a, b):
    return _pin(cv.add(a, b))


def _roll_masked(pts, ident, d, direction: int):
    """Shift batched points along axis 1 by a TRACED distance d (down for
    direction=+1, up for -1); vacated positions become the identity. A
    traced shift keeps every Hillis-Steele level the same traced body — the
    point add traces ONCE under fori_loop instead of log2(N) unrolled
    instances (each complete add is ~3k HLO ops; unrolling was a
    multi-hour XLA CPU compile / OOM'd the axon compile helper)."""
    n = pts[0].limbs.shape[1]
    pos = jnp.arange(n, dtype=jnp.int32)
    keep = (pos >= d) if direction > 0 else (pos < n - d)
    out = []
    for comp, icomp in zip(pts, ident):
        rolled = jnp.roll(comp.limbs, direction * d, axis=1)
        out.append(fr.RR(
            jnp.where(keep[None, :, None], rolled,
                      jnp.broadcast_to(icomp.limbs, rolled.shape)),
            comp.bound,
        ))
    return tuple(out), keep


@functools.partial(jax.jit, static_argnames=())
def _bucket_sums_chunk(points, order_c, starts_c, counts_c):
    """Bucket sums for one window chunk via a Hillis-Steele segmented scan:
    log2(N) fori_loop levels, every level one (wc, N)-batched complete add
    with a same-segment mask. Depth 2*log2(N) vs the while_loop
    accumulate's max bucket load, at full VPU utilization."""
    px, py, pz = points
    n = px.limbs.shape[0]
    nbuckets = starts_c.shape[1]
    pos = jnp.arange(n, dtype=jnp.int32)

    pts = _pin(cv.gather_point((px, py, pz), order_c))  # (wc, N, 32) limbs
    # segment ids from starts: id[i] = #buckets with start <= i, minus 1
    seg = (
        jnp.sum((starts_c[:, None, :] <= pos[None, :, None]).astype(jnp.int32),
                axis=2) - 1
    )  # (wc, N)
    ident = _varying_identity(px, (order_c.shape[0], 1))

    def level(i, pts):
        d = jnp.int32(1) << i
        shifted, keep = _roll_masked(pts, ident, d, +1)
        seg_sh = jnp.where(keep[None, :],
                           jnp.roll(seg, d, axis=1), jnp.int32(-1))
        summed = cv.add(shifted, pts)
        return _pin(cv.select_point(seg_sh == seg, summed, pts))

    pts = jax.lax.fori_loop(0, max(n - 1, 1).bit_length(), level, pts)
    # bucket sum = scan value at each bucket's last element
    last = jnp.clip(starts_c + counts_c - 1, 0, n - 1)  # (wc, B)
    sums = tuple(
        fr.RR(jnp.take_along_axis(comp.limbs, last[:, :, None], axis=1),
              comp.bound)
        for comp in pts
    )
    identb = _varying_identity(px, (order_c.shape[0], nbuckets))
    return _pin(cv.select_point(counts_c > 0, sums, identb))


def bucket_sums_scan(points, order, starts, counts, c: int = 8,
                     w_chunk: int = 8):
    """Bucket sums via segmented scan: same (W, 2^c) projective accumulator
    as _bucket_accumulate, at depth 2*log2(N) instead of max bucket load.
    Window chunks run as separate dispatches of one shared jitted program
    (bounds both the gathered-point working set and the compile size)."""
    windows = order.shape[0]
    out_chunks = []
    for w0 in range(0, windows, w_chunk):
        out_chunks.append(_bucket_sums_chunk(
            points, order[w0 : w0 + w_chunk], starts[w0 : w0 + w_chunk],
            counts[w0 : w0 + w_chunk],
        ))
    return tuple(
        fr.RR(jnp.concatenate([ch[i].limbs for ch in out_chunks], axis=0),
              out_chunks[0][i].bound)
        for i in range(3)
    )


@functools.partial(jax.jit, static_argnames=("c",))
def bucket_reduce_logdepth(acc, c: int):
    """Per-window totals sum_b b*S_b at depth ~2*2*log2(2^c): suffix scan
    of bucket sums (sum_b b*S_b = sum_{b>=1} suffix(b)) followed by a
    prefix-sum scan whose last element is the total. Both scans are
    Hillis-Steele fori_loops with traced shifts (one point-add trace
    each)."""
    # bucket count from the accumulator axis, NOT 1<<c: a signed-digit plan
    # (host_bucket_plan signed=True) carries 2^(c-1)+1 buckets
    nbuckets = acc[0].limbs.shape[1]
    ident = _varying_identity(acc[0], (acc[0].limbs.shape[0], 1))
    levels = max(nbuckets - 1, 1).bit_length()

    def suffix_level(i, suf):
        d = jnp.int32(1) << i
        shifted, _ = _roll_masked(suf, ident, d, -1)
        return _padd(suf, shifted)

    suf = jax.lax.fori_loop(0, levels, suffix_level, acc)
    # drop bucket 0's suffix (sum runs over b >= 1)
    cur = tuple(
        fr.RR(
            comp.limbs.at[:, 0].set(
                jnp.broadcast_to(icomp.limbs[:, 0], comp.limbs[:, 0].shape)
            ),
            comp.bound,
        )
        for comp, icomp in zip(suf, ident)
    )

    def prefix_level(i, cur):
        d = jnp.int32(1) << i
        shifted, _ = _roll_masked(cur, ident, d, +1)
        return _padd(cur, shifted)

    cur = jax.lax.fori_loop(0, levels, prefix_level, cur)
    return tuple(fr.RR(comp.limbs[:, nbuckets - 1], comp.bound) for comp in cur)


def combine_windows_host(totals, c: int):
    """Host finish: totals is the device (W,) per-window projective point
    tuple; returns the affine int point (or None).

    result = sum_w 2^(c*w) * T_w — one native Pippenger call when the C++
    backend is loaded (the Python-bigint Horner fold measured 0.16 s/pass
    of the batch-32 verifier: ~256 doublings + W adds in pure Python),
    Horner doublings otherwise."""
    host = tuple(fr.RR(np.asarray(comp.limbs), comp.bound) for comp in totals)
    pts = cv.to_affine_ints(host)
    entries = [(p, pow(2, c * w, ff.R)) for w, p in enumerate(pts)
               if p is not None]
    if not entries:
        return None
    return ff.g1_msm([p for p, _ in entries], [s for _, s in entries])


def msm_window_totals(points, scalars_np: np.ndarray, c: int = 8):
    """Device part of the log-depth MSM: host plan + segmented-scan bucket
    sums + log-depth reduce. Returns the (W,) projective window totals
    (device); finish with combine_windows_host."""
    order, starts, counts = host_bucket_plan(scalars_np, c)
    acc = bucket_sums_scan(points, jnp.asarray(order), jnp.asarray(starts),
                           jnp.asarray(counts), c=c)
    return bucket_reduce_logdepth(acc, c=c)


def msm_fast(points, scalars, c: int = 8):
    """Small/medium-N MSM with host finish: affine int point (or None).
    For multi-million-point commits use msm_staged_bounded (the (W, N)
    gathered-point working set here grows as windows*N)."""
    totals = msm_window_totals(points, np.asarray(scalars), c)
    return combine_windows_host(totals, c)


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
