"""Final-pair 136-bit packing round-trip (reference C4)."""

import random

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.protocol.instances import (
    compute_verify_public_input_size,
    final_pair_to_instances,
    pack_point,
    unpack_point,
)


def test_pack_roundtrip():
    rng = random.Random(0)
    for _ in range(8):
        p = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
        assert unpack_point(pack_point(p)) == p
    assert unpack_point(pack_point(None)) is None


def test_final_pair_vector():
    rng = random.Random(1)
    wx = ff.g1_mul(ff.G1_GEN, 5)
    wg = ff.g1_mul(ff.G1_GEN, 7)
    inner = [rng.randrange(ff.R) for _ in range(3)]
    v = final_pair_to_instances(wx, wg, inner)
    assert len(v) == 4 + 3
    assert unpack_point(v[0:2]) == wx
    assert unpack_point(v[2:4]) == wg

    class Spec:
        n_proofs = 2
        public_input_size = 3

    assert compute_verify_public_input_size([Spec(), Spec()]) == 4 + 12
