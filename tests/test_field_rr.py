"""Differential tests: carry-free redundant field/curve kernels vs the oracle."""

import random

import numpy as np
import jax

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import curve_rr as cvr
from halo2_snark_aggregator_tpu.ops import field_rr as fr


_JIT_CACHE = {}


def _jit(fn, name):
    if name not in _JIT_CACHE:
        _JIT_CACHE[name] = jax.jit(fn)
    return _JIT_CACHE[name]


def _rand(rng, spec, n):
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    return vals, fr.rr_from_host(spec, vals)


def test_roundtrip():
    rng = random.Random(0)
    vals, a = _rand(rng, fr.FQ, 8)
    assert fr.rr_to_host(fr.FQ, a) == vals


def test_mont_mul_rr():
    rng = random.Random(1)
    for spec in (fr.FQ, fr.FR):
        a_vals, a = _rand(rng, spec, 16)
        b_vals, b = _rand(rng, spec, 16)
        got = fr.rr_to_host(spec, _jit(lambda x, y, s=spec: fr.mont_mul(s, x, y), f'mul{spec.name}')(a, b))
        assert got == [x * y % spec.modulus for x, y in zip(a_vals, b_vals)]


def test_mul_edge_and_chains():
    spec = fr.FQ
    edge = [0, 1, spec.modulus - 1, spec.modulus - 2, (1 << 255) % spec.modulus, 2]
    a = fr.rr_from_host(spec, edge)
    sq = _jit(lambda x, s=spec: fr.mont_mul(s, x, x), f'sqr{spec.name}')(a)
    assert fr.rr_to_host(spec, sq) == [v * v % spec.modulus for v in edge]
    # chain: (a^2 + a - a) * a repeatedly, exercising add/sub/normalize paths
    cur = a
    expected = list(edge)
    for _ in range(4):
        cur = fr.mont_mul(spec, fr.sub(spec, fr.add(spec, sq, cur), sq), a)
        expected = [e * v % spec.modulus for e, v in zip(expected, edge)]
    assert fr.rr_to_host(spec, cur) == expected


def test_add_sub_scale():
    rng = random.Random(2)
    spec = fr.FR
    a_vals, a = _rand(rng, spec, 8)
    b_vals, b = _rand(rng, spec, 8)
    assert fr.rr_to_host(spec, fr.add(spec, a, b)) == [
        (x + y) % spec.modulus for x, y in zip(a_vals, b_vals)
    ]
    assert fr.rr_to_host(spec, fr.sub(spec, a, b)) == [
        (x - y) % spec.modulus for x, y in zip(a_vals, b_vals)
    ]
    assert fr.rr_to_host(spec, fr.scale_small(spec, a, 9)) == [
        9 * x % spec.modulus for x in a_vals
    ]


def test_curve_rr_complete_add():
    rng = random.Random(3)
    pts_a = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(3)]
    p = pts_a[0]
    # batch covering generic add, identity left/right, doubling, inverse pair
    cases_a = [pts_a[0], pts_a[1], None, p, p, p]
    cases_b = [pts_a[1], pts_a[2], p, None, p, ff.g1_neg(p)]
    expected = [ff.g1_add(x, y) for x, y in zip(cases_a, cases_b)]
    a = cvr.from_affine_ints(cases_a)
    b = cvr.from_affine_ints(cases_b)
    got = cvr.to_affine_ints(_jit(cvr.add, 'cadd')(a, b))
    assert got == expected
    got_dbl = cvr.to_affine_ints(_jit(cvr.double, 'cdbl')(a))
    assert got_dbl == [ff.g1_double(x) for x in cases_a]


def test_msm_rr():
    from halo2_snark_aggregator_tpu.ops import msm as msm_mod

    rng = random.Random(4)
    n = 33
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    # duplicate a point so two identical points land in one bucket sometimes
    pts[5] = pts[4]
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = ff.R - 1
    scalars[4] = scalars[5]
    expected = ff.g1_msm(pts, scalars)
    assert msm_mod.msm_host(pts, scalars, c=8) == expected
    assert msm_mod.msm_host(pts, scalars, c=4) == expected


def test_pow_inv_canonical():
    rng = random.Random(7)
    spec = fr.FR
    vals = [rng.randrange(1, spec.modulus) for _ in range(4)] + [0]
    a = fr.rr_from_host(spec, vals)
    inv = _jit(lambda x, s=spec: fr.inv(s, x), "inv")(a)
    got = fr.rr_to_host(spec, inv)
    assert got == [pow(v, -1, spec.modulus) if v else 0 for v in vals]
    # canonical 16-bit limb extraction
    from halo2_snark_aggregator_tpu.ops import field as fo

    can = _jit(lambda x, s=spec: fr.to_canonical16(s, x), "can")(a)
    assert fo.limbs_to_ints(np.asarray(can)) == vals


def test_scalar_mul_rr():
    import jax.numpy as jnp

    from halo2_snark_aggregator_tpu.ops import field as fo

    rng = random.Random(8)
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(2)] + [None]
    scalars = [rng.randrange(ff.R), 1, 12345]
    p = tuple(fr.with_bound(c, 12) for c in cvr.from_affine_ints(pts))
    s = jnp.asarray(fo.ints_to_limbs(scalars))
    out = _jit(cvr.scalar_mul, "smul")(p, s)
    host = tuple(fr.RR(np.asarray(c.limbs), c.bound) for c in out)
    assert cvr.to_affine_ints(host) == [
        ff.g1_mul(pt, k) for pt, k in zip(pts, scalars)
    ]
