"""Differential tests: ops/ntt.py vs the host-exact domain NTT."""

import random

from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.ops.ntt import ntt_host_ints
from halo2_snark_aggregator_tpu.prover import domain


def test_ntt_forward_matches_host():
    rng = random.Random(0)
    k = 6
    vals = [rng.randrange(R) for _ in range(1 << k)]
    expected = domain.ntt(vals, domain.omega_for_k(k))
    got = ntt_host_ints(vals, k)
    assert got == expected


def test_ntt_roundtrip():
    rng = random.Random(1)
    k = 5
    vals = [rng.randrange(R) for _ in range(1 << k)]
    fwd = ntt_host_ints(vals, k)
    back = ntt_host_ints(fwd, k, inverse=True)
    assert back == vals
