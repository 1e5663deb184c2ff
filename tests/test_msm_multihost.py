"""Hierarchical (host x chip) MSM over the virtual 8-device CPU mesh vs the
host oracle. Exercises the two-level reduction: ICI all-gather within a
host row, one point per host over the outer (DCN) axis."""

import random

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.parallel.multihost import (
    make_host_mesh,
    msm_hier_host,
)


def test_msm_hier_matches_oracle():
    rng = random.Random(1)
    n = 44  # not divisible by 8: exercises identity padding
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    expected = ff.g1_msm(pts, scalars)
    mesh = make_host_mesh(n_hosts=2, chips_per_host=4)
    got = msm_hier_host(pts, scalars, mesh, c=4)
    assert got == expected


def test_msm_hier_single_host_column():
    """Degenerate 1-host mesh must still work (pure-ICI path)."""
    rng = random.Random(2)
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(16)]
    scalars = [rng.randrange(ff.R) for _ in range(16)]
    expected = ff.g1_msm(pts, scalars)
    mesh = make_host_mesh(n_hosts=1, chips_per_host=8)
    got = msm_hier_host(pts, scalars, mesh, c=4)
    assert got == expected


def test_msm_hier_lite_matches_oracle():
    """Compile-lean hierarchical engine vs host oracle (both collective
    levels + in-program fori fold + host window combine)."""
    import numpy as np

    from halo2_snark_aggregator_tpu.ops import curve_lite as cvl
    from halo2_snark_aggregator_tpu.ops import field as fo
    from halo2_snark_aggregator_tpu.parallel.multihost import msm_hier_lite

    rng = random.Random(4)
    n = 48
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    expected = ff.g1_msm(pts, scalars)
    mesh = make_host_mesh(n_hosts=2, chips_per_host=4)
    got = msm_hier_lite(cvl.from_affine_ints(pts), fo.ints_to_limbs(scalars),
                        mesh, c=4)
    assert got == expected
