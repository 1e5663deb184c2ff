"""Differential tests for the TPU-accelerated prover (prover/accel.py).

The host-exact prover (prover/prove.py) is the oracle: on identical inputs
and blinding seed, create_proof_accel must produce BYTE-IDENTICAL proofs —
this pins the NTT-offloaded pipeline (coset-sharded quotient, log-depth grand
products, NTT-form Kate division, Pippenger commits) to the reference
transcript layout (verify.rs:342-571) down to every commitment point.
"""

import numpy as np
import pytest

from halo2_snark_aggregator_tpu.circuits.lookup import SimpleLookupCircuit
from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.prover import accel
from halo2_snark_aggregator_tpu.prover.keygen import keygen
from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG
from halo2_snark_aggregator_tpu.prover.prove import create_proof
from halo2_snark_aggregator_tpu.transcript.host import PoseidonWrite


def test_codecs_roundtrip():
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(31), "little") % ff.R for _ in range(64)]
    mont = accel.ints_to_mont(vals)
    assert accel.mont_to_ints(mont) == vals
    # powers by log-doubling
    base = vals[0]
    pw = accel.mont_to_ints(accel.mont_powers(base, 13))
    assert pw == [pow(base, i, ff.R) for i in range(13)]
    # prefix product
    cp = accel.mont_to_ints(accel._cumprod_mont(accel.ints_to_mont(vals[:7])))
    acc, expect = 1, []
    for v in vals[:7]:
        acc = acc * v % ff.R
        expect.append(acc)
    assert cp == expect


def test_points_to_device_roundtrip():
    from halo2_snark_aggregator_tpu.ops import curve_rr as cv
    pts = [ff.g1_mul(ff.G1_GEN, i + 2) for i in range(5)] + [None]
    dev = accel.points_to_device(pts)
    back = cv.to_affine_ints(dev)
    assert back == pts


@pytest.mark.parametrize("circuit_cls", [SimpleMulCircuit, SimpleLookupCircuit])
def test_accel_proof_bit_exact(circuit_cls):
    k = circuit_cls.K
    params = ParamsKZG.setup_cached(k)
    c = circuit_cls()
    vk, pk = keygen(c, k, params)
    insts = c.instances()

    host_proof = create_proof(pk, params, [c], [insts], PoseidonWrite(), seed=7)

    apk = accel.AccelPk.from_host(pk)
    aparams = accel.AccelParams.from_params(params)
    accel_proof = accel.create_proof_accel(
        apk, aparams, [c], [insts], PoseidonWrite(), seed=7)

    assert accel_proof == host_proof


def test_srs_accel_matches_host():
    """Device fixed-base SRS generation reproduces unsafe_setup exactly."""
    from halo2_snark_aggregator_tpu.ops import curve_rr as cv
    from halo2_snark_aggregator_tpu.prover import srs

    k = 5
    host = ParamsKZG.unsafe_setup(k)
    aparams = srs.unsafe_setup_accel(k, lagrange_prefix=1 << k)
    assert cv.to_affine_ints(aparams.g_dev) == host.g
    assert aparams.g_lagrange == host.g_lagrange
    assert aparams.s_g2 == host.s_g2
    # round-trip through the disk cache
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        a1 = srs.setup_cached_accel(k, cache_dir=d)
        a2 = srs.setup_cached_accel(k, cache_dir=d)
        assert cv.to_affine_ints(a2.g_dev) == host.g
        assert a2.s_g2 == host.s_g2
        assert a2.g_lagrange[: 1 << k] == host.g_lagrange


def test_keygen_accel_matches_host():
    k = SimpleLookupCircuit.K
    params = ParamsKZG.setup_cached(k)
    c = SimpleLookupCircuit()
    vk_host, pk_host = keygen(c, k, params)
    aparams = accel.AccelParams.from_params(params)
    vk_acc, apk = accel.keygen_accel(c, k, aparams)

    assert vk_acc.fixed_commitments == vk_host.fixed_commitments
    assert vk_acc.permutation_commitments == vk_host.permutation_commitments
    assert vk_acc.transcript_repr() == vk_host.transcript_repr()
    for host_sig, acc_sig in zip(pk_host.sigmas_lagrange, apk.sigmas_lagrange):
        assert accel.mont_to_ints(acc_sig) == host_sig
    for host_fc, acc_fc in zip(pk_host.fixed_coeff, apk.fixed_coeff):
        assert accel.mont_to_ints(acc_fc) == host_fc


def test_accel_proof_spill_mode_bit_exact():
    """spill=True (host-resident polynomials, LRU ext cache) must not change
    a single byte."""
    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    c = SimpleMulCircuit(8, 9)
    vk, pk = keygen(c, k, params)
    aparams = accel.AccelParams.from_params(params)
    apk = accel.AccelPk.from_host(pk)
    base = accel.create_proof_accel(apk, aparams, [c], [c.instances()],
                                    PoseidonWrite(), seed=11)
    vk2, apk2 = accel.keygen_accel(c, k, aparams, spill=True)
    assert vk2.transcript_repr() == vk.transcript_repr()
    spilled = accel.create_proof_accel(apk2, aparams, [c], [c.instances()],
                                       PoseidonWrite(), seed=11, spill=True)
    assert spilled == base


def test_accel_proof_verifies():
    """Belt-and-braces: the accel proof also passes the abstract verifier."""
    from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueEccChip
    from halo2_snark_aggregator_tpu.protocol import verify as pv
    from halo2_snark_aggregator_tpu.protocol.transcript import PoseidonTranscriptRead

    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    c = SimpleMulCircuit(4, 9)
    vk, pk = keygen(c, k, params)
    apk = accel.AccelPk.from_host(pk)
    aparams = accel.AccelParams.from_params(params)
    proof = accel.create_proof_accel(
        apk, aparams, [c], [c.instances()], PoseidonWrite(), seed=3)

    ctx = ValueContext()
    pchip = ValueEccChip()
    nchip = schip = pchip.scalar_chip
    t = PoseidonTranscriptRead(proof, ctx, nchip)
    cp = pv.CircuitProof(
        name="simple", vk=vk, params=params,
        proofs=[pv.ProofData(instances=[c.instances()], transcript=t, key="p0")])
    *_, ok = pv.verify_single_proof_in_chip(ctx, nchip, schip, pchip, cp)
    assert ok


def test_accel_proof_device_commits_bit_exact():
    """Force commit_mode='device' at small k so the device Pippenger commit
    path (msm_staged_split over the device SRS) is pinned byte-exact against
    host commits — 'auto' uses host MSMs below HOST_MSM_MAX_K, leaving the
    device path untested at test sizes otherwise."""
    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    c = SimpleMulCircuit(5, 6)
    vk, pk = keygen(c, k, params)
    insts = c.instances()

    host_proof = create_proof(pk, params, [c], [insts], PoseidonWrite(), seed=2)
    apk = accel.AccelPk.from_host(pk)
    aparams = accel.AccelParams.from_params(params, commit_mode="device")
    accel_proof = accel.create_proof_accel(
        apk, aparams, [c], [insts], PoseidonWrite(), seed=2)
    assert accel_proof == host_proof


def test_g_host_points_reconstruction():
    """AccelParams.g_host_points reconstructs the affine SRS from the
    PROJECTIVE device triple (z != 1 after fixed_base_msm's add tree):
    anchor g[0] == G1 generator, all points on-curve, and a host commit
    matches the oracle MSM over the reconstructed basis."""
    import random

    from halo2_snark_aggregator_tpu.ff import bn254 as ff
    from halo2_snark_aggregator_tpu.prover import accel as A
    from halo2_snark_aggregator_tpu.prover.srs import setup_cached_accel

    p = setup_cached_accel(6)
    g = p.g_host_points()
    assert g[0] == ff.G1_GEN
    for x, y in g[:8]:
        assert (y * y - x * x * x - 3) % ff.P == 0
    rng = random.Random(9)
    vals = [rng.randrange(ff.R) for _ in range(40)]
    got = p.commit_coeff_mont(A.ints_to_mont(vals))
    assert got == ff.g1_msm(g[:40], vals)
