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


def test_msm_sharded_production_rr_realistic_size():
    """Production-RR sharded MSM at a realistic size (VERDICT r3 #7): 4096
    points over the 8-device virtual mesh at the production window c=8,
    chunk 512 per device, vs the host oracle. Uses structured scalars
    (mixed tiny/large/duplicate) so bucket skew paths execute too."""
    import numpy as np

    rng = random.Random(7)
    n = 4096
    base = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(64)]
    pts = [base[i % 64] if i % 3 else ff.g1_mul(base[i % 64], 2 + i)
           for i in range(n)]
    scalars = [
        0 if i % 97 == 0 else
        (i if i % 5 == 0 else rng.randrange(ff.R))
        for i in range(n)
    ]
    expected = ff.g1_msm(pts, scalars)
    mesh = make_mesh(8)
    got = msm_sharded_host(pts, scalars, mesh, c=8)
    assert got == expected


def test_msm_sharded_lite_matches_oracle():
    """Compile-lean engine (ops/msm_lite + curve_lite) differential test:
    full-width random scalars, identity padding, vs the host oracle."""
    from halo2_snark_aggregator_tpu.parallel.msm_shard import (
        msm_sharded_lite_host,
    )

    rng = random.Random(3)
    n = 41
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    expected = ff.g1_msm(pts, scalars)
    mesh = make_mesh(8)
    got = msm_sharded_lite_host(pts, scalars, mesh, c=4)
    assert got == expected


def test_curve_lite_add_complete_cases():
    """RCB completeness over the wave-batched canonical engine: P+Q, P+P,
    P+(-P), P+O, O+O, all in one batched add call."""
    import numpy as np

    from halo2_snark_aggregator_tpu.ops import curve_lite as cvl

    P1 = ff.g1_mul(ff.G1_GEN, 7)
    P2 = ff.g1_mul(ff.G1_GEN, 11)
    negP1 = (P1[0], (-P1[1]) % ff.P)
    lhs = cvl.from_affine_ints([P1, P1, P1, P1, None])
    rhs = cvl.from_affine_ints([P2, P1, negP1, None, None])
    out = cvl.add(lhs, rhs)
    got = cvl.to_affine_ints(out)
    assert got[0] == ff.g1_add(P1, P2)
    assert got[1] == ff.g1_double(P1)
    assert got[2] is None
    assert got[3] == P1
    assert got[4] is None
