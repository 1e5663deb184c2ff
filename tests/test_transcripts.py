"""Transcript format tests: Poseidon and SHA flavors, writer/reader duality."""

import hashlib
import random

from halo2_snark_aggregator_tpu.arith.ast import V
from halo2_snark_aggregator_tpu.arith.value import ValueContext, ValueFieldChip
from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.transcript.host import (
    PoseidonRead,
    PoseidonWrite,
    ShaRead,
    ShaWrite,
)


def _pts_scalars(seed, n=3):
    rng = random.Random(seed)
    pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
    scalars = [rng.randrange(ff.R) for _ in range(n)]
    return pts, scalars


def test_poseidon_write_read_duality():
    pts, scalars = _pts_scalars(0)
    w = PoseidonWrite()
    w.common_scalar(42)  # vk digest analog
    challenges_w = []
    for p, s in zip(pts, scalars):
        w.write_point(p)
        w.write_scalar(s)
        challenges_w.append(w.squeeze_challenge())
    proof = w.finalize()

    r = PoseidonRead(proof)
    r.common_scalar(42)
    for p, s in zip(pts, scalars):
        assert r.read_point() == p
        assert r.read_scalar() == s
        assert r.squeeze_challenge() == challenges_w.pop(0)
    assert r.at_end()


def test_sha_write_read_duality():
    for algo in ("sha256", "sha3_256"):
        pts, scalars = _pts_scalars(1)
        w = ShaWrite(algo)
        challenges_w = []
        for p, s in zip(pts, scalars):
            w.write_point(p)
            w.write_scalar(s)
            challenges_w.append(w.squeeze_challenge())
        proof = w.finalize()

        r = ShaRead(proof, algo)
        for p, s in zip(pts, scalars):
            assert r.read_point() == p
            assert r.read_scalar() == s
            assert r.squeeze_challenge() == challenges_w.pop(0)
        assert r.at_end()


def test_sha_squeeze_is_reference_shaped():
    """sha.rs:81-92: squeeze = H(state || 0x00), then state := H'(digest);
    challenge = digest zero-extended to 64B reduced into Fr."""
    w = ShaWrite("sha256")
    w.common_scalar(7)
    inner = hashlib.sha256()
    inner.update(b"\x00" * 31 + b"\x02" + ff.fe_to_bytes(7)[::-1])
    inner.update(b"\x00")  # challenge prefix
    digest = inner.digest()
    expected = ff.fe_from_bytes_wide(digest + b"\x00" * 32, ff.R)
    assert w.squeeze_challenge() == expected


def test_arith_ast():
    ctx = ValueContext()
    chip = ValueFieldChip()
    out = ((V(3) * 4 + V(5)) / V(2)).eval(ctx, chip)
    # (3*4 ... note: V(3)*4 wraps int 4 as a value leaf
    assert out == (3 * 4 + 5) * pow(2, -1, ff.R) % ff.R
