"""Host oracle layer tests: BN254 fields, curves, pairing.

Mirrors what halo2curves' own test-suite guarantees for the reference
(SURVEY.md L0: halo2curves 0.2.1).
"""

import random

from halo2_snark_aggregator_tpu.ff import bn254 as ff


def test_moduli_structure():
    assert ff.P % 4 == 3
    assert (ff.R - 1) % (1 << ff.FR_S) == 0
    assert pow(ff.FR_ROOT_OF_UNITY, 1 << ff.FR_S, ff.R) == 1
    assert pow(ff.FR_ROOT_OF_UNITY, 1 << (ff.FR_S - 1), ff.R) != 1
    # DELTA generates the order-T subgroup complement
    assert pow(ff.FR_DELTA, ff.FR_T, ff.R) == 1


def test_g1_group_law():
    rng = random.Random(0)
    g = ff.G1_GEN
    assert ff.g1_is_on_curve(g)
    a, b = rng.randrange(ff.R), rng.randrange(ff.R)
    pa = ff.g1_mul(g, a)
    pb = ff.g1_mul(g, b)
    assert ff.g1_is_on_curve(pa)
    assert ff.g1_add(pa, pb) == ff.g1_mul(g, (a + b) % ff.R)
    assert ff.g1_add(pa, ff.g1_neg(pa)) is None
    assert ff.g1_double(pa) == ff.g1_mul(g, 2 * a % ff.R)
    # subgroup order
    assert ff.g1_mul(g, ff.R) is None


def test_g1_msm_matches_naive():
    rng = random.Random(1)
    g = ff.G1_GEN
    pts = [ff.g1_mul(g, rng.randrange(1, ff.R)) for _ in range(50)]
    scalars = [rng.randrange(ff.R) for _ in range(50)]
    expected = None
    for p, s in zip(pts, scalars):
        expected = ff.g1_add(expected, ff.g1_mul(p, s))
    assert ff.g1_msm(pts, scalars) == expected


def test_g1_compressed_roundtrip():
    rng = random.Random(2)
    for _ in range(10):
        p = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
        assert ff.g1_from_compressed(ff.g1_to_compressed(p)) == p
    assert ff.g1_from_compressed(ff.g1_to_compressed(None)) is None


def test_g2_group_law():
    rng = random.Random(3)
    g = ff.G2_GEN
    assert ff.g2_is_on_curve(g)
    a, b = rng.randrange(ff.R), rng.randrange(ff.R)
    pa = ff.g2_mul(g, a)
    pb = ff.g2_mul(g, b)
    assert ff.g2_is_on_curve(pa)
    assert ff.g2_add(pa, pb) == ff.g2_mul(g, (a + b) % ff.R)
    assert ff.g2_mul(g, ff.R) is None


def test_fq12_tower():
    rng = random.Random(4)
    a = ff.Fq12(
        ff.Fq6(*[ff.Fq2(rng.randrange(ff.P), rng.randrange(ff.P)) for _ in range(3)]),
        ff.Fq6(*[ff.Fq2(rng.randrange(ff.P), rng.randrange(ff.P)) for _ in range(3)]),
    )
    assert a * a.inverse() == ff.Fq12.one()
    # frobenius is the p-power map
    assert a.frobenius() == a.pow(ff.P)


def test_pairing_bilinear():
    e = ff.pairing(ff.G1_GEN, ff.G2_GEN)
    assert not e.is_one()
    # e(aP, bQ) == e(P, Q)^(ab)
    a, b = 3, 5
    lhs = ff.pairing(ff.g1_mul(ff.G1_GEN, a), ff.g2_mul(ff.G2_GEN, b))
    assert lhs == e.pow(a * b)
    # non-degenerate of order r
    assert e.pow(ff.R).is_one()


def test_pairing_check_kzg_shape():
    # e(C - y*G1, G2) == e(W, (s - z) G2)  for C = s^d-style toy example:
    # use the aggregator-shaped check e(A, sG2) * e(B, -G2) == 1 with B = s*A.
    s = 123456789
    a = ff.g1_mul(ff.G1_GEN, 42)
    b = ff.g1_mul(a, s)
    s_g2 = ff.g2_mul(ff.G2_GEN, s)
    assert ff.pairing_check([(a, s_g2), (b, ff.g2_neg(ff.G2_GEN))])
    assert not ff.pairing_check([(a, s_g2), (ff.g1_add(b, ff.G1_GEN), ff.g2_neg(ff.G2_GEN))])
