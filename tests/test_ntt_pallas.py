"""Differential tests: ops/ntt_pallas fused butterfly NTT vs ops/ntt.ntt.

Interpret mode on CPU at k=11 (the smallest size whose half-spans are BLOCK
multiples). Checks forward, inverse (incl. 1/n scale), and the roundtrip.
"""

import random

import numpy as np

from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.ops import field as fo
from halo2_snark_aggregator_tpu.ops import ntt as ntt_mod
from halo2_snark_aggregator_tpu.ops import ntt_pallas as ntp

K = 11


def _random_mont(rng, n):
    return np.stack([fo.FR.to_mont_int(rng.randrange(R)) for _ in range(n)])


def test_ntt_pallas_forward_matches_jnp():
    rng = random.Random(3)
    vals = _random_mont(rng, 1 << K)
    ref = np.asarray(ntt_mod.ntt(vals, K))
    got = np.asarray(ntp.ntt_pallas(vals, K, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_ntt_pallas_inverse_roundtrip():
    rng = random.Random(4)
    vals = _random_mont(rng, 1 << K)
    fwd = np.asarray(ntp.ntt_pallas(vals, K, interpret=True))
    back = np.asarray(ntp.ntt_pallas(fwd, K, inverse=True, interpret=True))
    np.testing.assert_array_equal(back, vals)
    ref_inv = np.asarray(ntt_mod.ntt(fwd, K, inverse=True))
    np.testing.assert_array_equal(back, ref_inv)
