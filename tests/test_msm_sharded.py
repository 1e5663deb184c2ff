"""Sharded MSM over the virtual 8-device CPU mesh vs host oracle."""

import random

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.parallel.msm_shard import make_mesh, msm_sharded_host


def test_msm_sharded_matches_oracle():
    rng = random.Random(0)
    n = 40  # deliberately not divisible by 8 to exercise identity padding
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    expected = ff.g1_msm(pts, scalars)
    mesh = make_mesh(8)
    got = msm_sharded_host(pts, scalars, mesh, c=4)
    assert got == expected
