"""Reference-parity fixtures (SURVEY §7 fixture plan, VERDICT round-1 #2).

No Rust toolchain or vendored halo2 dependencies exist in this environment
(zero egress), so fixtures come from three external sources, in decreasing
strength:

1. **Public standards**: the BN254/alt_bn128 parameters pinned by EIP-196/
   EIP-197 — field modulus, group order, G1/G2 generators — checked as
   literal constants *in this file* against the library.
2. **External implementations in the image**: hashlib's sha256/blake2b are
   the externally-maintained hash oracles; the SHA transcript challenge is
   recomputed here clean-room from the byte protocol documented at
   halo2-snark-aggregator-api/src/transcript/sha.rs (prefixes 0x00/0x01/
   0x02, big-endian coordinate reversal, squeeze = digest + state reseed)
   and compared byte-for-byte.
3. **Mathematical identities no wrong implementation passes**: subgroup
   order annihilation (r·G = O on both groups), pairing bilinearity
   e(aP, bQ) = e(P, Q)^{ab}, nondegeneracy, and inverse-pair cancellation —
   these pin the entire Fq12 tower + Miller loop + final exponentiation
   against the standard-constants anchor of (1) without any trusted code.

What is *frozen-self* rather than external (documented in PARITY.md): the
Poseidon Grain constants (PSE spec construction, no external KAT available
here) and the halo2curves compressed-point bit layout (format documented at
ff/bn254.py; golden bytes below pin it against regressions).
"""

import hashlib

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ff.bn254 import Fq2

# --- EIP-196/197 pinned constants (public standard) ------------------------

ALT_BN128_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
ALT_BN128_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
EIP197_G2_X = Fq2(
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
EIP197_G2_Y = Fq2(
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)


def test_standard_parameters():
    assert ff.P == ALT_BN128_P
    assert ff.R == ALT_BN128_R
    assert ff.G1_GEN == (1, 2)
    assert ff.G2_GEN == (EIP197_G2_X, EIP197_G2_Y)
    assert ff.g1_is_on_curve(ff.G1_GEN)
    assert ff.g2_is_on_curve(ff.G2_GEN)


def test_subgroup_orders():
    # r annihilates both generators; no smaller listed factor does
    assert ff.g1_mul_py(ff.G1_GEN, ff.R) is None
    assert ff.g2_mul(ff.G2_GEN, ff.R) is None
    assert ff.g1_mul_py(ff.G1_GEN, ff.R - 1) == (1, ff.P - 2)  # -G1


def test_pairing_bilinearity():
    a, b = 1234567, 7654321
    e_ab = ff.pairing(ff.g1_mul(ff.G1_GEN, a), ff.g2_mul(ff.G2_GEN, b))
    e_base = ff.pairing(ff.G1_GEN, ff.G2_GEN)
    assert e_ab == e_base.pow(a * b % ff.R)
    # nondegeneracy
    assert not e_base.is_one()
    # swap the scalars between sides
    assert e_ab == ff.pairing(ff.g1_mul(ff.G1_GEN, b), ff.g2_mul(ff.G2_GEN, a))


def test_pairing_inverse_cancellation():
    P1 = ff.g1_mul(ff.G1_GEN, 31)
    negP1 = (P1[0], ff.P - P1[1])
    assert ff.pairing_check_py([(P1, ff.G2_GEN), (negP1, ff.G2_GEN)])
    # and a wrong pair fails
    P2 = ff.g1_mul(ff.G1_GEN, 32)
    assert not ff.pairing_check_py([(P1, ff.G2_GEN), (P2, ff.G2_GEN)])


# --- compressed-point codec golden bytes (frozen layout) --------------------


def test_g1_compressed_golden():
    # G1 generator (1, 2): x = 1 little-endian, y even -> sign bit clear
    assert ff.g1_to_compressed(ff.G1_GEN) == b"\x01" + b"\x00" * 31
    # -G1 = (1, p-2): y odd -> sign bit (top bit of byte 31) set
    neg = (1, ff.P - 2)
    assert ff.g1_to_compressed(neg) == b"\x01" + b"\x00" * 30 + b"\x80"
    # identity = all zeros
    assert ff.g1_to_compressed(None) == b"\x00" * 32
    for pt in (ff.G1_GEN, neg, None, ff.g1_mul(ff.G1_GEN, 987654321)):
        assert ff.g1_from_compressed(ff.g1_to_compressed(pt)) == pt


# --- SHA256 transcript clean-room recomputation -----------------------------
#
# Byte protocol per the reference (transcript/sha.rs:15-19, 84-97): domain
# prefixes 0x00 (challenge squeeze), 0x01 (point), 0x02 (scalar); points
# absorb as uncompressed big-endian x || y; scalars as big-endian repr;
# squeeze = digest of (state || 0x00), then the transcript state re-seeds
# with the digest; the challenge reduces the 32-byte digest into Fr.


def test_sha_transcript_clean_room():
    from halo2_snark_aggregator_tpu.transcript.host import ShaWrite

    pt = ff.g1_mul(ff.G1_GEN, 5)
    sc = 123456789123456789

    t = ShaWrite()
    t.write_point(pt)
    t.write_scalar(sc)
    ch = t.squeeze_challenge()

    # clean-room: hashlib only, per sha.rs — 31 zero bytes then the domain
    # prefix before each element, coordinates/scalars big-endian; squeeze
    # appends the 0x00 prefix, digests, and reduces the 32-byte digest
    # little-endian-wide into Fr (halo2curves from_bytes_wide)
    h = hashlib.sha256()
    h.update(b"\x00" * 31 + b"\x01")
    h.update(pt[0].to_bytes(32, "big"))
    h.update(pt[1].to_bytes(32, "big"))
    h.update(b"\x00" * 31 + b"\x02")
    h.update(sc.to_bytes(32, "big"))
    h.update(b"\x00")
    expected = int.from_bytes(h.digest(), "little") % ff.R
    assert ch == expected


def test_blake2b_vk_digest_parameters():
    """The vk digest must use blake2b-512 with personal "Halo2-Verify-Key"
    and the u64-LE length prefix (verify.rs:56-67); recomputed via hashlib."""
    from halo2_snark_aggregator_tpu.circuits.simple import SimpleMulCircuit
    from halo2_snark_aggregator_tpu.prover.keygen import keygen
    from halo2_snark_aggregator_tpu.prover.kzg import ParamsKZG

    k = SimpleMulCircuit.K
    params = ParamsKZG.setup_cached(k)
    vk, _pk = keygen(SimpleMulCircuit(2, 3), k, params)
    s = vk._pinned_str().encode()
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
    h.update(len(s).to_bytes(8, "little"))
    h.update(s)
    assert vk.transcript_repr() == ff.fe_from_bytes_wide(h.digest(), ff.R)


# --- Poseidon Grain constants (frozen golden; PSE spec construction) --------
#
# No external KAT for the PSE poseidon crate's T=9/RATE=8/r_f=8/r_p=63
# BN254-Fr instance is available in this zero-egress environment; these
# literals freeze the Grain LFSR output so any regression in the generator
# (hashes/poseidon_spec.py) is caught. Provenance: generated once from the
# Grain construction specified by the Poseidon paper and the PSE `poseidon`
# crate (see PARITY.md "fixture provenance").

POSEIDON_RC_0_0 = 0x2088CE9534577BF38BE7BC457F2756D558D66E0C07B9CC001A580BD42CDA0E77
POSEIDON_RC_0_1 = 0x1B86E63908C4B12AF43CEC6810356C94D21C9E37D73DFFF9742A58E0EC356BE1
POSEIDON_RC_70_8 = 0x0EF2861F4EC9BA5FEC74BA22C0B7AF9D458C3CD8F90C825C1F36110CA2EE9076
POSEIDON_MDS_0_0 = 0x2C46D4597D7B331F08FEE3164F84316CDA479CACA15F628A37864F87F542685C
POSEIDON_MDS_8_8 = 0x02E2D3C38DA06EB39D9B077ED6AE28087BC1B6E712C47ECFC02730A0BED746E9


def test_poseidon_grain_constants_frozen():
    from halo2_snark_aggregator_tpu.hashes.poseidon_spec import (
        R_F,
        R_P,
        RATE,
        T,
        generate_constants,
    )

    assert (T, RATE, R_F, R_P) == (9, 8, 8, 63)
    rc, mds = generate_constants()
    assert len(rc) == R_F + R_P and len(rc[0]) == T
    assert rc[0][0] == POSEIDON_RC_0_0
    assert rc[0][1] == POSEIDON_RC_0_1
    assert rc[70][8] == POSEIDON_RC_70_8
    assert mds[0][0] == POSEIDON_MDS_0_0
    assert mds[8][8] == POSEIDON_MDS_8_8
    # MDS is the Cauchy matrix 1/(x_i + y_j): invertible, no zero entries
    assert all(all(v != 0 for v in row) for row in mds)
