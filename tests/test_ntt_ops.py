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


def test_ntt_staged_matches_fused():
    """Per-stage large-k path (ops/ntt.ntt_staged) vs the fused kernel."""
    import numpy as np

    from halo2_snark_aggregator_tpu.ops import field as fo
    from halo2_snark_aggregator_tpu.ops.ntt import ntt, ntt_staged

    rng = np.random.default_rng(5)
    k = 8
    vals = [int.from_bytes(rng.bytes(40), "little") % R for _ in range(1 << k)]
    mont = np.stack([fo.FR.to_mont_int(v) for v in vals])
    for inverse in (False, True):
        fused = np.asarray(ntt(mont, k, inverse=inverse))
        # host input path
        assert (np.asarray(ntt_staged(mont, k, inverse=inverse)) == fused).all()
        # device input path
        import jax.numpy as jnp
        assert (np.asarray(ntt_staged(jnp.asarray(mont), k, inverse=inverse))
                == fused).all()
