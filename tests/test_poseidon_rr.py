"""Differential test: redundant-rep batched Poseidon vs host spec."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from halo2_snark_aggregator_tpu.ff.bn254 import R
from halo2_snark_aggregator_tpu.hashes import poseidon_spec as spec
from halo2_snark_aggregator_tpu.hashes.poseidon_host import PoseidonSponge
from halo2_snark_aggregator_tpu.ops import field_rr as fr
from halo2_snark_aggregator_tpu.ops import poseidon_rr as po


def _state_rr(states):
    arr = np.stack([np.stack([fr.FR.to_mont_int(v) for v in s]) for s in states])
    return fr.RR(jnp.asarray(arr), 8)


def test_permute_rr_matches_host():
    rng = random.Random(0)
    states = [[rng.randrange(R) for _ in range(spec.T)] for _ in range(2)]
    out = jax.jit(po.permute)(_state_rr(states))
    host_out = [spec.permute(s) for s in states]
    arr = np.asarray(out.limbs)
    for b in range(2):
        got = [fr.FR.from_mont_limbs(arr[b, i]) for i in range(spec.T)]
        assert got == host_out[b]


def test_sponge_rr_matches_host():
    rng = random.Random(1)
    vals = [rng.randrange(R) for _ in range(10)]  # chunks of 8 + 2
    host = PoseidonSponge()
    host.update(vals)
    expected = host.squeeze()

    state = fr.RR(jnp.zeros((1, spec.T, fr.NLIMBS), dtype=jnp.int32), 1)
    c1 = fr.RR(jnp.asarray(np.stack([fr.FR.to_mont_int(v) for v in vals[:8]])[None]), 8)
    c2 = fr.RR(jnp.asarray(np.stack([fr.FR.to_mont_int(v) for v in vals[8:]])[None]), 8)
    absorb = jax.jit(po.absorb_chunk, static_argnames=("n_inputs",))
    state = absorb(state, c1, n_inputs=8)
    state = absorb(state, c2, n_inputs=2)
    got = fr.FR.from_mont_limbs(np.asarray(state.limbs)[0, 1])
    assert got == expected
