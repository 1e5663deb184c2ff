"""Differential tests: ops/curve.py + ops/msm.py vs the host oracle."""

import random

import jax.numpy as jnp
import numpy as np

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import curve as cv
from halo2_snark_aggregator_tpu.ops import field as fo
from halo2_snark_aggregator_tpu.ops import msm as msm_mod


def _rand_points(rng, n):
    return [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]


def test_add_double_matches_oracle():
    rng = random.Random(0)
    pts_a = _rand_points(rng, 4)
    pts_b = _rand_points(rng, 4)
    a = cv.from_affine_ints(pts_a)
    b = cv.from_affine_ints(pts_b)
    got = cv.to_affine_ints(cv.add(a, b))
    assert got == [ff.g1_add(x, y) for x, y in zip(pts_a, pts_b)]
    got_dbl = cv.to_affine_ints(cv.double(a))
    assert got_dbl == [ff.g1_double(x) for x in pts_a]


def test_add_edge_cases():
    rng = random.Random(1)
    p = _rand_points(rng, 1)[0]
    cases_a = [p, None, p, p]
    cases_b = [None, p, ff.g1_neg(p), p]
    a = cv.from_affine_ints(cases_a)
    b = cv.from_affine_ints(cases_b)
    got = cv.to_affine_ints(cv.add(a, b))
    expected = [p, p, None, ff.g1_double(p)]
    assert got == expected
    assert np.asarray(cv.is_on_curve(a)).all()


def test_scalar_mul():
    rng = random.Random(2)
    pts = _rand_points(rng, 3)
    scalars = [rng.randrange(ff.R) for _ in range(3)]
    p = cv.from_affine_ints(pts)
    s = jnp.asarray(fo.ints_to_limbs(scalars))
    got = cv.to_affine_ints(cv.scalar_mul(p, s))
    assert got == [ff.g1_mul(pt, k) for pt, k in zip(pts, scalars)]


def test_msm_small():
    rng = random.Random(3)
    n = 32
    pts = _rand_points(rng, n)
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    # include edge scalars
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = ff.R - 1
    expected = ff.g1_msm(pts, scalars)
    got = msm_mod.msm_host(pts, scalars, c=8)
    assert got == expected


def test_msm_tiny_window():
    rng = random.Random(4)
    n = 10
    pts = _rand_points(rng, n)
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    expected = ff.g1_msm(pts, scalars)
    got = msm_mod.msm_host(pts, scalars, c=4)
    assert got == expected


def test_msm_fast_logdepth():
    """Segmented-scan bucket sums + log-depth reduce (msm_fast) vs oracle,
    including edge scalars and a non-power-of-two N."""
    from halo2_snark_aggregator_tpu.ops import curve_rr as cvr
    from halo2_snark_aggregator_tpu.ops import field_rr as fr

    rng = random.Random(5)
    for n in (48, 64):
        pts = _rand_points(rng, n)
        scalars = [rng.randrange(ff.R) for _ in range(n)]
        scalars[0] = 0
        scalars[1] = 1
        scalars[2] = ff.R - 1
        scalars[3] = scalars[4]  # duplicate digits exercise segment masks
        expected = ff.g1_msm(pts, scalars)
        jpts = tuple(
            fr.with_bound(c, msm_mod.CARRY_BOUND)
            for c in cvr.from_affine_ints(pts)
        )
        scal16 = np.asarray(fo.ints_to_limbs(scalars))
        got = msm_mod.msm_fast(jpts, scal16, c=8)
        assert got == expected


def test_decompress_g1_ys():
    from halo2_snark_aggregator_tpu.ops import curve_rr as cvr

    rng = random.Random(6)
    pts = _rand_points(rng, 5)
    xs = [p[0] for p in pts]
    # an x not on the curve: x^3+3 must be a non-residue
    bad = next(
        x for x in range(2, 50)
        if pow((x**3 + 3) % ff.P, (ff.P - 1) // 2, ff.P) != 1
    )
    xs.append(bad)
    ys = cvr.decompress_g1_ys(xs)
    assert ys[-1] is None
    for (x, y_ref), y in zip(pts, ys[:-1]):
        assert y is not None and (y * y - (x**3 + 3)) % ff.P == 0
        assert y in (y_ref, ff.P - y_ref)


def test_msm_staged_split_matches_oracle():
    """Load-balanced split bucket plan (host_bucket_plan_split): uniform AND
    skewed scalars — the plain plan degrades when digits are skewed (the top
    window of 254-bit scalars collapses onto a handful of buckets)."""
    import random

    import numpy as np

    from halo2_snark_aggregator_tpu.ff import bn254 as ff
    from halo2_snark_aggregator_tpu.ops import curve_rr as cv
    from halo2_snark_aggregator_tpu.ops import field as fo
    from halo2_snark_aggregator_tpu.ops import field_rr as frr
    from halo2_snark_aggregator_tpu.ops import msm as msm_mod

    rng = random.Random(5)
    n = 128
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    jpts = tuple(frr.with_bound(c, msm_mod.CARRY_BOUND)
                 for c in cv.from_affine_ints(pts))
    for scal in (
        [rng.randrange(ff.R) for _ in range(n)],        # uniform
        [rng.randrange(1 << 40) for _ in range(n)],      # skewed low bits
        [0] * (n - 1) + [rng.randrange(ff.R)],           # nearly all zero
    ):
        sn = fo.ints_to_limbs(scal)
        got = msm_mod.msm_staged_split(jpts, sn, c=4, target=8)
        assert got == ff.g1_msm(pts, scal)
        _o, _s, counts, _w = msm_mod.host_bucket_plan_split(sn, 4, 8)
        assert counts.max() <= 8


def test_msm_staged_split_prefetch_matches_oracle():
    """The pre-gathered accumulate (_accum_steps_pregather) is bit-identical
    to the loop-carried gather path, including partial final dispatches and
    the skewed plans above."""
    import random

    from halo2_snark_aggregator_tpu.ff import bn254 as ff
    from halo2_snark_aggregator_tpu.ops import curve_rr as cv
    from halo2_snark_aggregator_tpu.ops import field as fo
    from halo2_snark_aggregator_tpu.ops import field_rr as frr
    from halo2_snark_aggregator_tpu.ops import msm as msm_mod

    rng = random.Random(9)
    n = 96
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    jpts = tuple(frr.with_bound(c, msm_mod.CARRY_BOUND)
                 for c in cv.from_affine_ints(pts))
    for scal in (
        [rng.randrange(ff.R) for _ in range(n)],
        [0] * (n - 2) + [rng.randrange(ff.R)] * 2,
    ):
        sn = fo.ints_to_limbs(scal)
        # trips=3 forces a partial final dispatch at target=8
        got = msm_mod.msm_staged_split(jpts, sn, c=4, target=8, trips=3,
                                       prefetch=True)
        assert got == ff.g1_msm(pts, scal)


def test_msm_staged_split_tree_matches_oracle():
    """The log-depth tree accumulate (_accum_steps_tree): identity-masked
    leaves + complete-add folding must agree with the host oracle, including
    odd trip counts (leftover leaf carried across a level), overshoot
    dispatches, and skewed plans."""
    import random

    from halo2_snark_aggregator_tpu.ff import bn254 as ff
    from halo2_snark_aggregator_tpu.ops import curve_rr as cv
    from halo2_snark_aggregator_tpu.ops import field as fo
    from halo2_snark_aggregator_tpu.ops import field_rr as frr
    from halo2_snark_aggregator_tpu.ops import msm as msm_mod

    rng = random.Random(11)
    n = 96
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    jpts = tuple(frr.with_bound(c, msm_mod.CARRY_BOUND)
                 for c in cv.from_affine_ints(pts))
    for scal in (
        [rng.randrange(ff.R) for _ in range(n)],
        [0] * (n - 2) + [rng.randrange(ff.R)] * 2,
        [rng.randrange(1 << 40) for _ in range(n)],
    ):
        sn = fo.ints_to_limbs(scal)
        for trips in (3, 8):  # odd tree width AND power-of-two
            got = msm_mod.msm_staged_split(jpts, sn, c=4, target=8,
                                           trips=trips, accum="tree")
            assert got == ff.g1_msm(pts, scal)
