"""Differential tests: native C++ runtime vs the pure-Python host oracle.

The native library (native/bn254_native.cpp) carries the host-side hot paths
(Poseidon transcript replay, G1 MSM/scalar-mul, prover NTT); every entry point
is checked bit-exactly against the Python-int implementations here.
"""

import random

import pytest

from halo2_snark_aggregator_tpu import native
from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.hashes import poseidon_spec as spec
from halo2_snark_aggregator_tpu.prover import domain

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")

rng = random.Random(1234)


def test_field_ops_fr_fq():
    for field, mod in ((native.FR, ff.R), (native.FQ, ff.P)):
        a = [rng.randrange(mod) for _ in range(64)] + [0, mod - 1, 1]
        b = [rng.randrange(mod) for _ in range(64)] + [mod - 1, mod - 1, 0]
        assert native.fe_op(field, 0, a, b) == [(x + y) % mod for x, y in zip(a, b)]
        assert native.fe_op(field, 1, a, b) == [(x - y) % mod for x, y in zip(a, b)]
        assert native.fe_mul(field, a, b) == [x * y % mod for x, y in zip(a, b)]


def test_pow_and_inv_batch():
    e = rng.randrange(ff.R)
    a = [rng.randrange(ff.R) for _ in range(8)] + [0, 1]
    assert native.fe_pow(native.FR, a, e) == [pow(x, e, ff.R) for x in a]
    vals = [rng.randrange(ff.R) for _ in range(33)]
    vals[7] = 0  # zero maps to zero
    got = native.fe_inv_batch(native.FR, vals)
    assert got == [pow(x, -1, ff.R) if x else 0 for x in vals]


def test_poseidon_permute_matches_python():
    for _ in range(3):
        st = [rng.randrange(ff.R) for _ in range(spec.T)]
        assert native.poseidon_permute(st) == spec.permute_py(st)


def test_g1_mul_and_msm():
    pts = [ff.g1_mul_py(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(20)]
    pts += [None]
    scs = [rng.randrange(ff.R) for _ in range(20)] + [5]
    assert native.g1_msm(pts, scs) == ff.g1_msm_py(pts, scs)
    assert native.g1_mul_batch(pts[:4], scs[:4]) == [
        ff.g1_mul_py(p, s) for p, s in zip(pts[:4], scs[:4])
    ]
    # identity cases
    assert native.g1_msm(pts, [0] * len(pts)) is None
    assert native.g1_mul_batch([ff.G1_GEN], [0]) == [None]
    assert native.g1_mul_batch([None], [7]) == [None]
    # cancellation: P + (-P)
    p = pts[0]
    assert native.g1_msm([p, p], [3, ff.R - 3]) is None


def test_g1_msm_larger():
    n = 300
    base = [ff.g1_mul(ff.G1_GEN, i + 1) for i in range(n)]
    scs = [rng.randrange(ff.R) for _ in range(n)]
    # oracle via sum of native muls (python pippenger is slow at this size)
    expect = None
    for p, s in zip(native.g1_mul_batch(base, scs), [1] * n):
        expect = ff.g1_add(expect, p)
    assert native.g1_msm(base, scs) == expect


def test_ntt_matches_python():
    for k in (6, 10):
        w = domain.omega_for_k(k)
        vals = [rng.randrange(ff.R) for _ in range(1 << k)]
        assert native.fr_ntt(vals, w) == domain.ntt_py(vals, w)


def test_pairing_check_matches_python():
    # e(aG1, bG2) * e(-abG1, G2) == 1
    a, b = rng.randrange(1, ff.R), rng.randrange(1, ff.R)
    p1 = ff.g1_mul(ff.G1_GEN, a)
    q1 = ff.g2_mul(ff.G2_GEN, b)
    p2 = ff.g1_neg(ff.g1_mul(ff.G1_GEN, a * b % ff.R))
    good = [(p1, q1), (p2, ff.G2_GEN)]
    assert native.pairing_check(good) is True
    assert ff.pairing_check_py(good) is True
    bad = [(p1, q1), (ff.g1_mul(ff.G1_GEN, 12345), ff.G2_GEN)]
    assert native.pairing_check(bad) is False
    assert ff.pairing_check_py(bad) is False
    # identity entries are skipped on both sides
    with_id = good + [(None, ff.G2_GEN), (ff.G1_GEN, None)]
    assert native.pairing_check(with_id) is True
