"""Differential tests for the fused Pallas bucket-accumulate MSM
(ops/msm_pallas.py, accum='pallas').

CPU strategy: the kernel BODY is ~30k flat vector ops — XLA:CPU takes many
minutes to compile it even in pallas interpret mode (which jits internally),
so CI tests exercise the exact row-level functions the kernel traces
(_mont_mul/_mod_add/_mod_sub/_mixed_add) EAGERLY on tiny blocks against the
host oracle, plus the host-side tiling/packing glue. The pallas_call
plumbing itself (BlockSpecs, grid revisiting, SMEM scalar) is validated on
real hardware: scripts/smoke_msm_pallas_tpu.py oracle-checks a small MSM and
the production 2^16 path on the chip, and the recorded MSM bench runs
accum='pallas' end-to-end (BENCH_MSM_r03.json)."""

import random

import jax.numpy as jnp
import numpy as np

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import curve_rr as cv
from halo2_snark_aggregator_tpu.ops import field_rr as frr
from halo2_snark_aggregator_tpu.ops import msm as msm_mod
from halo2_snark_aggregator_tpu.ops import msm_pallas as mp

W = 4  # lanes per test block


def _rows_from_int(v: int, lanes: int = W):
    """Canonical Montgomery 16-limb rows, value broadcast to (1, lanes)."""
    m = v * (1 << 256) % ff.P
    return [jnp.full((1, lanes), (m >> (16 * k)) & 0xFFFF, jnp.uint32)
            for k in range(16)]


def _int_from_rows(rows, lane: int = 0) -> int:
    m = sum(int(np.asarray(r)[0, lane]) << (16 * k)
            for k, r in enumerate(rows))
    return m * pow(1 << 256, -1, ff.P) % ff.P


def test_row_field_ops_match_oracle():
    rng = random.Random(31)
    for _ in range(8):
        a, b = rng.randrange(ff.P), rng.randrange(ff.P)
        ra, rb = _rows_from_int(a), _rows_from_int(b)
        assert _int_from_rows(mp._mont_mul(ra, rb)) == a * b % ff.P
        assert _int_from_rows(mp._mod_add(ra, rb)) == (a + b) % ff.P
        assert _int_from_rows(mp._mod_sub(ra, rb)) == (a - b) % ff.P
        assert _int_from_rows(mp._mod_small(ra, 9)) == 9 * a % ff.P
    # boundary values
    for a, b in ((0, 0), (ff.P - 1, ff.P - 1), (ff.P - 1, 1), (0, ff.P - 1)):
        ra, rb = _rows_from_int(a), _rows_from_int(b)
        assert _int_from_rows(mp._mont_mul(ra, rb)) == a * b % ff.P
        assert _int_from_rows(mp._mod_add(ra, rb)) == (a + b) % ff.P
        assert _int_from_rows(mp._mod_sub(ra, rb)) == (a - b) % ff.P


def test_mixed_add_rows_matches_oracle():
    """RCB mixed add completeness on the exact traced function: generic,
    doubling, inverse (-> identity), and identity-accumulator lanes."""
    rng = random.Random(32)
    p1 = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
    p2 = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
    cases = [(p1, p2), (p1, p1), (p1, ff.g1_neg(p1)), (None, p2)]
    for acc_pt, q_pt in cases:
        if acc_pt is None:
            acc = (_rows_from_int(0), _rows_from_int(1), _rows_from_int(0))
        else:
            acc = (_rows_from_int(acc_pt[0]), _rows_from_int(acc_pt[1]),
                   _rows_from_int(1))
        q = (_rows_from_int(q_pt[0]), _rows_from_int(q_pt[1]))
        x3, y3, z3 = mp._mixed_add(acc, q)
        xi, yi, zi = (_int_from_rows(x3), _int_from_rows(y3),
                      _int_from_rows(z3))
        want = ff.g1_add(acc_pt, q_pt)
        if want is None:
            assert zi == 0
        else:
            assert zi != 0
            z_inv = pow(zi, -1, ff.P)
            assert (xi * z_inv % ff.P, yi * z_inv % ff.P) == want


def test_full_add_rows_matches_oracle():
    """RCB complete projective+projective add (the reduce kernel's op):
    generic, doubling, inverse, and identity operands."""
    rng = random.Random(36)
    p1 = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
    p2 = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
    cases = [(p1, p2), (p1, p1), (p1, ff.g1_neg(p1)), (None, p2), (p1, None),
             (None, None)]

    def proj(pt):
        if pt is None:
            return (_rows_from_int(0), _rows_from_int(1), _rows_from_int(0))
        return (_rows_from_int(pt[0]), _rows_from_int(pt[1]),
                _rows_from_int(1))

    for a_pt, b_pt in cases:
        x3, y3, z3 = mp._full_add(proj(a_pt), proj(b_pt))
        xi, yi, zi = (_int_from_rows(x3), _int_from_rows(y3),
                      _int_from_rows(z3))
        want = ff.g1_add(a_pt, b_pt)
        if want is None:
            assert zi == 0
        else:
            z_inv = pow(zi, -1, ff.P)
            assert (xi * z_inv % ff.P, yi * z_inv % ff.P) == want


def test_tile_roundtrip():
    rng = np.random.default_rng(33)
    rb = 2 * mp.BLOCK
    arr = jnp.asarray(rng.integers(0, 1 << 16, (16, rb), dtype=np.uint32))
    tiled = mp._tile_value(arr)
    assert tiled.shape == (2 * 16 * mp.SUB, mp.LANE)
    assert np.array_equal(np.asarray(mp._untile_value(tiled, rb)),
                          np.asarray(arr))
    # lane l of block b lands at tile row (limb*SUB + l//LANE) of block b
    l, limb, b = 321, 5, 1
    got = np.asarray(tiled)[b * 128 + limb * mp.SUB + l // mp.LANE,
                            l % mp.LANE]
    assert got == np.asarray(arr)[limb, b * mp.BLOCK + l]
    cnt = jnp.asarray(rng.integers(0, 99, (1, rb), dtype=np.int32))
    ct = mp._tile_counts(cnt)
    assert ct.shape == (2 * mp.SUB, mp.LANE)
    assert np.array_equal(np.asarray(ct).reshape(-1), np.asarray(cnt)[0])


def test_table_roundtrip():
    rng = random.Random(21)
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(8)]
    jpts = tuple(frr.with_bound(c, msm_mod.CARRY_BOUND)
                 for c in cv.from_affine_ints(pts))
    tx, _ty = mp.table_from_rr(jpts)
    for i, (x, _y) in enumerate(pts):
        limbs = np.asarray(tx)[i].astype(np.int64)
        v = sum(int(l) << (16 * k) for k, l in enumerate(limbs))
        assert v == x * (1 << 256) % ff.P  # canonical Montgomery form


def test_rr_from_acc_roundtrip():
    rng = random.Random(34)
    vals = [rng.randrange(ff.P) for _ in range(4)]
    arr = np.zeros((16, 4), np.uint32)
    for i, v in enumerate(vals):
        m = v * (1 << 256) % ff.P
        arr[:, i] = [(m >> (16 * k)) & 0xFFFF for k in range(16)]
    x = jnp.asarray(arr)
    rr = mp.rr_from_acc((x, x, x), (4,))
    assert rr[0].bound == 12  # matches ops/msm.py CARRY_BOUND pinning
    assert frr.rr_to_host(frr.FQ, rr[0]) == vals


def test_pregather_matches_plan():
    """pregather16 fetches exactly the plan's (row, bucket, trip) points."""
    rng = random.Random(35)
    n = 32
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    jpts = tuple(frr.with_bound(c, msm_mod.CARRY_BOUND)
                 for c in cv.from_affine_ints(pts))
    scal = [rng.randrange(ff.R) for _ in range(n)]
    from halo2_snark_aggregator_tpu.ops import field as fo

    sn = fo.ints_to_limbs(scal)
    order, starts, counts, weights = msm_mod.host_bucket_plan_split(sn, 4, 4)
    tx, ty = mp.table_from_rr(jpts)
    trips = 3
    px, _py = mp.pregather16(tx, ty, jnp.asarray(order), jnp.asarray(starts),
                             jnp.int32(0), trips, jnp.asarray(weights))
    px = np.asarray(px)  # (T, 16, RB)
    rows, nbuckets = counts.shape
    tx_np = np.asarray(tx)
    for t in range(trips):
        for r in range(0, rows, 7):
            for b in range(0, nbuckets, 5):
                idx = min(starts[r, b] + t, n - 1)
                pt_idx = order[weights[r], idx]
                assert np.array_equal(px[t, :, r * nbuckets + b],
                                      tx_np[pt_idx])


def test_signed_recode_invariant():
    """sum_w 2^(cw) d'_w reconstructs the scalar; |d'| <= 2^(c-1)."""
    rng = random.Random(51)
    from halo2_snark_aggregator_tpu.ops import field as fo

    for c in (4, 8):
        scal = [rng.randrange(ff.R) for _ in range(64)] + [0, 1, ff.R - 1]
        sn = fo.ints_to_limbs(scal)
        windows = (fo.NBITS + c - 1) // c
        digits = np.zeros((windows, len(scal)), dtype=np.int64)
        for w in range(windows):
            for i, s in enumerate(scal):
                digits[w, i] = (s >> (w * c)) & ((1 << c) - 1)
        mags, signs = msm_mod.signed_recode(digits.copy(), c)
        assert mags.max() <= 1 << (c - 1)
        for i, s in enumerate(scal):
            v = sum(
                (1 << (c * w)) * int(mags[w, i]) * (-1 if signs[w, i] else 1)
                for w in range(windows)
            )
            assert v == s, (c, i)
        del sn


def test_signed_plan_reconstructs_msm():
    """Signed split plan semantics vs the host oracle: replaying the plan's
    (order|sign, starts, counts, weights) with bigint point arithmetic
    (bucket-weighted sums, sign as y-negation) must reproduce the MSM."""
    rng = random.Random(52)
    n = 48
    c = 4
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    scal = [rng.randrange(ff.R) for _ in range(n - 2)] + [0, ff.R - 1]
    from halo2_snark_aggregator_tpu.ops import field as fo

    sn = fo.ints_to_limbs(scal)
    order, starts, counts, weights = msm_mod.host_bucket_plan_split(
        sn, c, 4, signed=True)
    rows, nbuckets = counts.shape
    assert nbuckets == 1 << (c - 1)  # shifted slots: slot s = magnitude s+1
    total = None
    for r in range(rows):
        w = int(weights[r])
        row_sum = None
        for b in range(nbuckets):
            s_b = None
            for t in range(int(counts[r, b])):
                e = int(order[w, int(starts[r, b]) + t])
                idx = e & 0x7FFFFFFF
                sign = e < 0
                p = pts[idx]
                if sign:
                    p = (p[0], (-p[1]) % ff.P)
                s_b = ff.g1_add(s_b, p)
            if s_b is not None:
                for _ in range(b + 1):  # slot s carries magnitude s+1
                    row_sum = ff.g1_add(row_sum, s_b)
        if row_sum is not None:
            for _ in range(c * w):
                row_sum = ff.g1_double(row_sum)
            total = ff.g1_add(total, row_sum)
    expected = ff.g1_msm(pts, scal)
    assert total == expected


def test_pregather_signed_negates_y():
    """pregather16(signed=True) strips the sign bit for the index and
    returns p - y for negative-digit entries."""
    rng = random.Random(53)
    n = 32
    c = 4
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    jpts = tuple(frr.with_bound(cc, msm_mod.CARRY_BOUND)
                 for cc in cv.from_affine_ints(pts))
    scal = [rng.randrange(ff.R) for _ in range(n)]
    from halo2_snark_aggregator_tpu.ops import field as fo

    sn = fo.ints_to_limbs(scal)
    order, starts, counts, weights = msm_mod.host_bucket_plan_split(
        sn, c, 4, signed=True)
    tx, ty = mp.table_from_rr(jpts)
    trips = 3
    px, py = mp.pregather16(tx, ty, jnp.asarray(order), jnp.asarray(starts),
                            jnp.int32(0), trips, jnp.asarray(weights),
                            signed=True)
    px, py = np.asarray(px), np.asarray(py)
    rows, nbuckets = counts.shape
    tx_np, ty_np = np.asarray(tx), np.asarray(ty)

    def limbs_to_int(limbs16):
        return sum(int(v) << (16 * k) for k, v in enumerate(limbs16))

    checked_neg = 0
    for t in range(trips):
        for r in range(rows):
            for b in range(nbuckets):
                if t >= counts[r, b]:
                    continue
                e = int(order[int(weights[r]), int(starts[r, b]) + t])
                idx = e & 0x7FFFFFFF
                sign = e < 0
                assert np.array_equal(px[t, :, r * nbuckets + b],
                                      tx_np[idx])
                y = limbs_to_int(ty_np[idx])
                got_y = limbs_to_int(py[t, :, r * nbuckets + b])
                if sign:
                    assert got_y == (ff.P - y) % ff.P
                    checked_neg += 1
                else:
                    assert got_y == y
    assert checked_neg > 0  # the plan produced some negative digits
