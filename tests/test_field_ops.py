"""Differential tests: ops/field.py (jnp limb kernels) vs ff/bn254.py oracle."""

import random

import numpy as np
import jax.numpy as jnp

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import field as fo


def _rand_batch(rng, spec, n):
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    mont = np.stack([spec.to_mont_int(v) for v in vals])
    return vals, jnp.asarray(mont)


def _check(spec, arr, expected_ints):
    got = [spec.from_mont_limbs(np.asarray(a)) for a in np.asarray(arr)]
    assert got == [e % spec.modulus for e in expected_ints]


def test_limb_roundtrip():
    rng = random.Random(0)
    for _ in range(5):
        v = rng.randrange(ff.P)
        assert fo.limbs_to_int(fo.int_to_limbs(v)) == v


def test_add_sub_neg():
    rng = random.Random(1)
    for spec in (fo.FQ, fo.FR):
        a_vals, a = _rand_batch(rng, spec, 16)
        b_vals, b = _rand_batch(rng, spec, 16)
        _check(spec, fo.add(spec, a, b), [x + y for x, y in zip(a_vals, b_vals)])
        _check(spec, fo.sub(spec, a, b), [x - y for x, y in zip(a_vals, b_vals)])
        _check(spec, fo.neg(spec, a), [-x for x in a_vals])


def test_mont_mul():
    rng = random.Random(2)
    for spec in (fo.FQ, fo.FR):
        a_vals, a = _rand_batch(rng, spec, 32)
        b_vals, b = _rand_batch(rng, spec, 32)
        _check(spec, fo.mont_mul(spec, a, b), [x * y for x, y in zip(a_vals, b_vals)])


def test_mont_mul_edge_cases():
    spec = fo.FQ
    edge = [0, 1, spec.modulus - 1, spec.modulus - 2, (1 << 255) % spec.modulus]
    a = jnp.asarray(np.stack([spec.to_mont_int(v) for v in edge]))
    _check(spec, fo.mont_mul(spec, a, a), [v * v for v in edge])


def test_to_from_mont():
    rng = random.Random(3)
    vals = [rng.randrange(ff.R) for _ in range(8)]
    std = jnp.asarray(fo.ints_to_limbs(vals))
    mont = fo.to_mont(fo.FR, std)
    back = fo.from_mont(fo.FR, mont)
    assert fo.limbs_to_ints(np.asarray(back)) == vals


def test_pow_and_inv():
    rng = random.Random(4)
    spec = fo.FR
    vals, a = _rand_batch(rng, spec, 4)
    _check(spec, fo.pow_const(spec, a, 5), [pow(v, 5, spec.modulus) for v in vals])
    _check(spec, fo.inv(spec, a), [pow(v, -1, spec.modulus) for v in vals])


def test_batch_inv_tree_with_zeros():
    rng = random.Random(5)
    spec = fo.FQ
    vals = [rng.randrange(1, spec.modulus) for _ in range(7)] + [0]
    a = jnp.asarray(np.stack([spec.to_mont_int(v) for v in vals]))
    out = fo.batch_inv_tree(spec, a)
    got = [spec.from_mont_limbs(np.asarray(x)) for x in np.asarray(out)]
    expected = [pow(v, -1, spec.modulus) if v else 0 for v in vals]
    assert got == expected
