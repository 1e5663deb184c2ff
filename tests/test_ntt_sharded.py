"""Mesh-sharded four-step NTT vs the single-device kernel (8-device virtual
CPU mesh; the all-to-all transpose is the only collective)."""

import numpy as np

from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.ops import field as fo
from halo2_snark_aggregator_tpu.ops.ntt import ntt
from halo2_snark_aggregator_tpu.parallel.msm_shard import make_mesh
from halo2_snark_aggregator_tpu.parallel.ntt_shard import (
    ntt_sharded, ntt_sharded_to_host)


def _rand_mont(n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(n)]
    return np.stack([fo.FR.to_mont_int(v) for v in vals])


def test_ntt_sharded_matches_single_device():
    k1 = k2 = 5
    n = 1 << (k1 + k2)
    mesh = make_mesh(8)
    x = _rand_mont(n)

    expected = np.asarray(ntt(x, k1 + k2))
    r = ntt_sharded(x, k1, k2, mesh)
    got = ntt_sharded_to_host(r)
    assert (got == expected).all()


def test_ntt_sharded_inverse_roundtrip():
    k1, k2 = 4, 6
    n = 1 << (k1 + k2)
    mesh = make_mesh(8)
    x = _rand_mont(n, seed=3)

    fwd = ntt_sharded_to_host(ntt_sharded(x, k1, k2, mesh))
    back = ntt_sharded_to_host(ntt_sharded(fwd, k1, k2, mesh, inverse=True))
    assert (back == x).all()
    # and the inverse agrees with the single-device inverse
    expected = np.asarray(ntt(fwd, k1 + k2, inverse=True))
    assert (back == expected).all()
