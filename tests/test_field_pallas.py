"""Differential test: the Pallas mont_mul kernel against the jnp reference
(ops/field.py), itself pinned to the host oracle (ff/bn254.py)."""

import numpy as np
import pytest

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import field as fo
from halo2_snark_aggregator_tpu.ops import field_pallas as fp


@pytest.mark.parametrize("spec,modulus", [(fo.FR, ff.R), (fo.FQ, ff.P)])
def test_mont_mul_pallas_matches_reference(spec, modulus):
    rng = np.random.default_rng(11)
    n = 160  # exercises padding to BLOCK
    av = [int.from_bytes(rng.bytes(40), "little") % modulus for _ in range(n)]
    bv = [int.from_bytes(rng.bytes(40), "little") % modulus for _ in range(n)]
    a = np.stack([spec.to_mont_int(v) for v in av])
    b = np.stack([spec.to_mont_int(v) for v in bv])

    ref = np.asarray(fo.mont_mul(spec, a, b))
    out = np.asarray(fp.mont_mul_pallas(spec, a, b))
    assert (out == ref).all()

    # edge values: 0, 1, p-1
    edges = [0, 1, modulus - 1, modulus - 2]
    ea = np.stack([spec.to_mont_int(v) for v in edges])
    eb = np.stack([spec.to_mont_int(v) for v in reversed(edges)])
    assert (np.asarray(fp.mont_mul_pallas(spec, ea, eb))
            == np.asarray(fo.mont_mul(spec, ea, eb))).all()
