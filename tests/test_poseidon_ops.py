"""Differential tests: ops/poseidon.py batched permutation vs host spec."""

import random

import jax.numpy as jnp
import numpy as np

from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.hashes import poseidon_spec as spec
from halo2_snark_aggregator_tpu.hashes.poseidon_host import PoseidonSponge
from halo2_snark_aggregator_tpu.ops import field as fo
from halo2_snark_aggregator_tpu.ops import poseidon as po


def test_permute_matches_host():
    rng = random.Random(0)
    batch = 3
    states = [[rng.randrange(R) for _ in range(spec.T)] for _ in range(batch)]
    arr = jnp.asarray(
        np.stack([np.stack([fo.FR.to_mont_int(v) for v in s]) for s in states])
    )
    out = np.asarray(po.permute(arr))
    for b in range(batch):
        expected = spec.permute(states[b])
        got = [fo.FR.from_mont_limbs(out[b, i]) for i in range(spec.T)]
        assert got == expected


def test_sponge_squeeze_matches_host():
    rng = random.Random(1)
    vals = [rng.randrange(R) for _ in range(11)]  # 8 + 3: two absorb chunks
    host = PoseidonSponge()
    host.update(vals)
    expected = host.squeeze()

    state = jnp.zeros((1, spec.T, fo.LIMBS), dtype=jnp.uint32)
    chunk1 = jnp.asarray(
        np.stack([fo.FR.to_mont_int(v) for v in vals[:8]])[None]
    )
    chunk2 = jnp.asarray(
        np.stack([fo.FR.to_mont_int(v) for v in vals[8:]])[None]
    )
    state = po.absorb_chunk(state, chunk1, 8)
    state = po.absorb_chunk(state, chunk2, 3)
    got = fo.FR.from_mont_limbs(np.asarray(state)[0, 1])
    assert got == expected
