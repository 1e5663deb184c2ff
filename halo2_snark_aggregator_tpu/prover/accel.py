"""TPU-accelerated PLONK prover engine (NTT/MSM offload).

The reference delegates outer-proof creation to halo2's CPU prover
(verify_circuit.rs:985-995: create_proof::<KZG, ProverGWC>, rayon FFTs/MSMs).
Here the polynomial pipeline runs on the accelerator as batched limb kernels:

  * all polynomials are uint32[n, 16] Montgomery Fr vectors (ops/field.py);
    Lagrange<->coefficient moves are device NTTs (ops/ntt.py);
  * commitments are Pippenger MSMs over a device-resident SRS (ops/msm.py);
  * the quotient h(X) is computed with a **coset-sharded** evaluator: the
    extended-domain evaluation decomposes into `ratio = 2^(k_ext - k)`
    independent size-n NTTs (shard s = evaluations on the coset
    zeta*omega_ext^s*H). Within a shard a rotation by `rot` is a roll of the
    evaluation vector, and the vanishing divisor (zeta^n*omega_ext^{sn} - 1)
    is a per-shard constant — so each shard is one bounded XLA program and
    shards parallelize across chips (no single long-running kernel, per the
    axon rules);
  * grand products (permutation/lookup z) are log-depth doubling prefix
    products + one batched Montgomery inversion tree;
  * KZG openings use the NTT form of Kate division: w = INTT((q(omega^i) -
    q(z)) / (omega^i - z)) — no sequential synthetic-division recurrence.

Bit-exact contract: `create_proof_accel` produces byte-identical proofs to
prover/prove.py `create_proof` (same transcript layout, same blinding RNG
call order) — differentially tested in tests/test_accel_prover.py.
"""

from __future__ import annotations

import functools
import logging
import random as _random

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from ..ff.bn254 import FR_DELTA, FR_GENERATOR, R
from ..ops import curve_rr as cv
from ..ops import field as fo
from ..ops import field_rr as frr
from ..ops import msm as msm_ops
from ..ops.ntt import ntt_auto as ntt_dev
from ..protocol.plonk import Expression, VerifyingKey
from ..protocol.queryplan import query_plan, rotation_sets
from .domain import Domain, omega_for_k
from .keygen import Assignment, ProvingKey
from .kzg import ParamsKZG
from .prove import _permute_pair

FR16 = fo.FR
log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Fast host<->device codecs (bulk int <-> limb conversion via byte buffers)
# ---------------------------------------------------------------------------

def ints_to_std(vals) -> np.ndarray:
    """Python ints -> uint32[n, 16] standard-form 16-bit limbs."""
    buf = b"".join(int(v % R).to_bytes(32, "little") for v in vals)
    a = np.frombuffer(buf, dtype="<u2").reshape(len(vals), 16)
    return a.astype(np.uint32)


def std_to_ints(arr) -> list[int]:
    a = np.asarray(arr).astype("<u2")
    buf = a.tobytes()
    return [int.from_bytes(buf[i * 32 : (i + 1) * 32], "little")
            for i in range(a.shape[0])]


def ints_to_mont(vals) -> jnp.ndarray:
    """Python ints -> device Montgomery Fr vector."""
    return m_to_mont(np_to_dev(ints_to_std(vals)))


def mont_to_ints(arr) -> list[int]:
    # np_to_dev accepts both host and device inputs (slicing is a no-op copy
    # on device); dev_to_np bounds the return transfer
    return std_to_ints(dev_to_np(m_from_mont(np_to_dev(arr))))


from ..ops.field import dev_to_np, np_to_dev  # bounded tunnel transfers


def mont_scalar(v: int) -> jnp.ndarray:
    """One Fr value as a Montgomery (16,) limb array (host numpy)."""
    return jnp.asarray(FR16.to_mont_int(v % R))


def mont_powers(base: int, n: int) -> jnp.ndarray:
    """[1, base, base^2, ..., base^(n-1)] Montgomery, built by log-doubling."""
    one = mont_scalar(1)
    if n == 1:
        return one[None]
    p = jnp.stack([one, mont_scalar(base)])
    cur = mont_scalar(base * base % R)[None]
    while p.shape[0] < n:
        p = jnp.concatenate([p, m_mul(p, cur)], axis=0)
        cur = fo.mont_sqr(FR16, cur)
    return p[:n]


def _sum_mont_host(v) -> int:
    """Exact reduction of a (m, 16) Montgomery vector to the canonical int
    value of the sum. For large m a device partial sum over 2048-row chunks
    (16-bit limbs sum to < 2^27, safely inside uint32) shrinks the host
    transfer from the full vector to (m/2048, 16); the final column sum is
    exact in int64 (< 2^27 * 2^11 rows = 2^38)."""
    m = v.shape[0]
    if m >= (1 << 14):
        c = 1 << 11
        pad = (-m) % c
        if pad:
            v = jnp.concatenate(
                [jnp.asarray(v), jnp.zeros((pad, 16), dtype=jnp.uint32)])
        v = jnp.sum(jnp.asarray(v).reshape(-1, c, 16), axis=1)
    cols = np.asarray(v).astype(np.int64).sum(axis=0)
    total = sum(int(c) << (16 * i) for i, c in enumerate(cols))
    rinv = pow(1 << 256, -1, R)
    return total * rinv % R


def _cumprod_mont(v) -> jnp.ndarray:
    """Inclusive prefix product of a (n, 16) Montgomery vector (log-depth:
    d-doubling with a ones-pad shift — no gathers, no scan-over-n)."""
    n = v.shape[0]
    ones = jnp.broadcast_to(jnp.asarray(FR16.one_mont), (n, 16))
    d = 1
    while d < n:
        shifted = jnp.concatenate([ones[:d], v[:-d]], axis=0)
        v = m_mul(v, shifted)
        d *= 2
    return v


def _eval_at(poly_mont, powers) -> int:
    """Evaluate a coefficient-form Montgomery poly at the point whose power
    vector is `powers`; returns a canonical int. The dot product's additive
    reduction happens host-side exactly (see _sum_mont_host)."""
    n = poly_mont.shape[0]
    return _sum_mont_host(m_mul(poly_mont, powers[:n]))



# ---------------------------------------------------------------------------
# Jitted row-chunked field ops.
#
# The ops/field.py kernels are written for jit fusion: ONE eager mont_mul at
# (4M,16) materializes the (4M,16,16) product tensor plus 32 padded copies
# (~16GB) and OOMs the chip. Every row-wise op in this engine therefore goes
# through a jitted wrapper applied in fixed 2^18-row chunks — bounded
# transients, and exactly two compiled shapes per op for any k.
# ---------------------------------------------------------------------------

_CHUNK = 1 << 16


def _rowwise(fn):
    jfn = jax.jit(fn)

    def run(*args):
        n = None
        for a in args:
            if hasattr(a, "ndim") and a.ndim == 2:
                n = a.shape[0] if n is None else max(n, a.shape[0])
        if n is None or n <= _CHUNK:
            return jfn(*args)
        outs = []
        for i in range(0, n, _CHUNK):
            sl = [a[i : i + _CHUNK]
                  if (hasattr(a, "ndim") and a.ndim == 2 and a.shape[0] == n)
                  else a for a in args]
            outs.append(jfn(*sl))
        return jnp.concatenate(outs, axis=0)

    return run


m_mul = _rowwise(lambda a, b: fo.mont_mul(FR16, a, b))
m_add = _rowwise(lambda a, b: fo.add(FR16, a, b))
m_sub = _rowwise(lambda a, b: fo.sub(FR16, a, b))
m_to_mont = _rowwise(lambda a: fo.to_mont(FR16, a))
m_from_mont = _rowwise(lambda a: fo.from_mont(FR16, a))

_select_j = jax.jit(fo.select)


def m_select(cond, a, b):
    n = a.shape[0]
    if n <= _CHUNK:
        return _select_j(cond, a, b)
    return jnp.concatenate([
        _select_j(cond[i : i + _CHUNK], a[i : i + _CHUNK], b[i : i + _CHUNK])
        for i in range(0, n, _CHUNK)], axis=0)


_binv_j = jax.jit(functools.partial(fo.batch_inv_tree, FR16))


def _batch_inv(v):
    """Batched inversion. Small inputs: the fused inversion tree. Large
    inputs: chunked prefix/suffix products with ONE host inversion of the
    total — assumes nonzero entries (our denominators are random-shifted)."""
    n = v.shape[0]
    if n <= _CHUNK:
        return _binv_j(v)
    pre = _cumprod_mont(v)
    suf = jnp.flip(_cumprod_mont(jnp.flip(v, 0)), 0)
    total_int = mont_to_ints(pre[n - 1 : n])[0]
    inv_total = _bcast(mont_scalar(pow(total_int, -1, R)), n)
    one = mont_scalar(1)[None]
    pre_shift = jnp.concatenate([one, pre[:-1]], axis=0)
    suf_shift = jnp.concatenate([suf[1:], one], axis=0)
    return m_mul(m_mul(pre_shift, suf_shift), inv_total)


# ---------------------------------------------------------------------------
# Device-resident SRS + Pippenger commitments
# ---------------------------------------------------------------------------

def points_to_device(points) -> tuple:
    """Bulk host affine int points (None = identity) -> projective RR triple
    (Montgomery conversion on device; avoids the per-point Python loop of
    curve_rr.from_affine_ints)."""
    n = len(points)
    xb, yb, zs = [], [], np.ones(n, dtype=np.int32)
    for i, pt in enumerate(points):
        if pt is None:
            xb.append((0).to_bytes(32, "little"))
            yb.append((1).to_bytes(32, "little"))
            zs[i] = 0
        else:
            xb.append(int(pt[0]).to_bytes(32, "little"))
            yb.append(int(pt[1]).to_bytes(32, "little"))
    xs = np.frombuffer(b"".join(xb), dtype=np.uint8).reshape(n, 32).astype(np.int32)
    ys = np.frombuffer(b"".join(yb), dtype=np.uint8).reshape(n, 32).astype(np.int32)
    r2 = frr.RR(jnp.asarray(np.broadcast_to(frr.FQ.r2, (n, 32))), 8)

    def mont(limbs):
        return frr.mont_mul(frr.FQ, frr.RR(jnp.asarray(limbs), 8), r2)

    zlimbs = np.zeros((n, 32), dtype=np.int32)
    zlimbs[:, : 32] = frr.FQ.one_mont[None, :]
    zlimbs *= zs[:, None]
    return (mont(xs), mont(ys), frr.RR(jnp.asarray(zlimbs), 8))


class AccelParams:
    """KZG params with the coefficient-basis SRS resident on device.

    Every commitment goes through `commit_coeff` (a Pippenger MSM over [tau^i]
    G1); Lagrange-basis commits are INTT + commit_coeff, which yields exactly
    the same group element. Only a small g_lagrange prefix is kept host-side
    for the verifier's instance commitments."""

    # below this size the host MSM beats kernel dispatch (and spares the
    # Pippenger compile in small-k tests; the kernel itself is differentially
    # tested in tests/test_curve_msm.py)
    HOST_MSM_MAX_K = 10

    def __init__(self, k: int, g_dev, g2, s_g2, g_lagrange,
                 host: ParamsKZG | None = None, commit_mode: str = "auto"):
        self.k = k
        self.n = 1 << k
        self.g_dev = g_dev
        self.g2 = g2
        self.s_g2 = s_g2
        self.g_lagrange = g_lagrange
        self.host = host
        assert commit_mode in ("auto", "device", "host")
        self.commit_mode = commit_mode

    @staticmethod
    def from_params(params: ParamsKZG, commit_mode: str = "auto") -> "AccelParams":
        need_dev = commit_mode == "device" or (
            commit_mode == "auto" and params.k > AccelParams.HOST_MSM_MAX_K)
        g_dev = points_to_device(params.g) if need_dev else None
        return AccelParams(params.k, g_dev, params.g2,
                           params.s_g2, params.g_lagrange, host=params,
                           commit_mode=commit_mode)

    def _use_host_msm(self) -> bool:
        import os

        mode = os.environ.get("H2T_COMMIT", "") or self.commit_mode
        if mode == "host":
            return True
        if mode != "auto":
            return False
        if self.host is not None and self.k <= self.HOST_MSM_MAX_K:
            return True
        # With the native C++ Pippenger loaded, the host commit beats the
        # device path up to much larger k (measured 0.6 s at 2^16 uniform,
        # 0.13 s skewed, vs minutes on device for SKEWED coefficient
        # scalars: the split plan's (row, bucket) lanes go ~99% idle when
        # most digits pile into a few buckets — the round-3 driver bench
        # burned its window exactly here, in keygen's fixed-column commits).
        # Prover commits are not the benched metric; robustness wins.
        # 22 covers the aggregator outer-proof sizes: measured ~0.6 s/2^16
        # commit scaling ~linearly (=> ~20 s at 2^21) vs ~40 s/commit on
        # the device path at k=21 — AND the round-4 k=21 outer run emitted
        # structurally invalid commitment points through the Pallas-accum
        # device commits (all 54 proof points off-curve; open bug, see
        # CLAUDE.md round-4 notes). Host commits are oracle-exact.
        max_k = int(os.environ.get("H2T_COMMIT_HOST_MAX_K", "22"))
        if self.k <= max_k and (self.host is not None
                                or self.g_dev is not None):
            from .. import native

            return native.available()
        return False

    def g_host_points(self) -> list:
        """Affine int SRS points for host commits; reconstructed lazily from
        the device limbs when the AccelParams came from the npz SRS cache
        (which stores no host ParamsKZG)."""
        if self.host is not None:
            return self.host.g
        cached = getattr(self, "_g_host", None)
        if cached is None:
            # the device SRS triple is PROJECTIVE (fixed_base_msm's add tree
            # leaves z != 1): batch-invert to affine, do not assume z = 1
            host = tuple(frr.RR(np.asarray(comp.limbs), comp.bound)
                         for comp in self.g_dev)
            cached = self._g_host = cv.to_affine_ints(host)
        return cached

    def commit_coeff_mont(self, coeffs_mont, pad_to: int | None = None):
        """Commit a device Montgomery coefficient vector; returns affine int
        point or None (identity)."""
        if self._use_host_msm():
            scalars = mont_to_ints(coeffs_mont)
            return ff.g1_msm(self.g_host_points()[: len(scalars)], scalars)
        m = coeffs_mont.shape[0]
        scalars = np.zeros((self.n, 16), dtype=np.uint32)
        scalars[:m] = dev_to_np(m_from_mont(jnp.asarray(coeffs_mont)))
        # load-balanced split plan: the plain plan's serial depth is set by
        # the TOP window of 254-bit scalars (6 meaningful bits -> ~n/64 max
        # bucket load, ~8x the uniform-window load at k=21); the split plan
        # bounds every row's depth to `target` (host-finished combine)
        # Default to the XLA pregather accumulate ('pre', the fixture-
        # validated prover path); H2T_MSM_ACCUM overrides for A/Bs. The
        # round-4 "Pallas commits emit off-curve points" bug is root-caused
        # and fixed (round 5): the PROJECTIVE device SRS fed the Pallas
        # kernel's affine table repack — the SRS is now normalized to
        # affine at build/load (prover/srs._affine_rr_limbs) and
        # table_from_rr fails loudly on projective rows.
        import os as _os

        return msm_ops.msm_staged_split(
            self.g_dev, scalars, c=8,
            accum=_os.environ.get("H2T_MSM_ACCUM") or "pre")

    def commit_lagrange_ints(self, values: list[int]):
        """Small commit in the Lagrange basis (instance columns)."""
        return ff.g1_msm(self.g_lagrange[: len(values)], values)


# ---------------------------------------------------------------------------
# Accelerated proving key
# ---------------------------------------------------------------------------

class AccelPk:
    """ProvingKey with all polynomials as device Montgomery vectors."""

    def __init__(self, vk: VerifyingKey, domain: Domain,
                 fixed_lagrange, fixed_coeff, sigmas_lagrange, sigmas_coeff):
        self.vk = vk
        self.domain = domain
        self.fixed_lagrange = fixed_lagrange
        self.fixed_coeff = fixed_coeff
        self.sigmas_lagrange = sigmas_lagrange
        self.sigmas_coeff = sigmas_coeff

    @staticmethod
    def from_host(pk: ProvingKey) -> "AccelPk":
        fl = [ints_to_mont(c) for c in pk.fixed_lagrange]
        fc = [ints_to_mont(c) for c in pk.fixed_coeff]
        sl = [ints_to_mont(s) for s in pk.sigmas_lagrange]
        sc = [ints_to_mont(s) for s in pk.sigmas_coeff]
        return AccelPk(pk.vk, pk.domain, fl, fc, sl, sc)


# ---------------------------------------------------------------------------
# Accelerated keygen (the aggregator circuit needs k=22: pure-host NTTs and
# host MSM commits are infeasible there — verify_circuit.rs:733-765/974-979)
# ---------------------------------------------------------------------------

def keygen_accel(circuit, k: int, params: AccelParams,
                 instances: list[list[int]] | None = None,
                 assignment: Assignment | None = None,
                 spill: bool = False):
    """Device-accelerated keygen_vk/keygen_pk: identical (vk, sigma polys,
    commitments) to prover.keygen.keygen, with

      * the permutation cycle-splice over numpy int32 arrays instead of
        per-cell Python tuples (24M tuples at k=22);
      * sigma polynomials assembled by numpy row-gather from a precomputed
        omega-power table (host gathers are C-speed; device gathers lower to
        scalar loads on TPU) and Montgomery-multiplied on device;
      * all Lagrange->coeff moves and commitments on device (NTT + Pippenger).

    Pass a pre-synthesized `assignment` to reuse witness generation between
    keygen and proving. Returns (vk, AccelPk).
    """
    from ..protocol.plonk import ConstraintSystem as _CS

    cs = _CS()
    config = circuit.configure(cs)
    n = 1 << k
    usable = n - (cs.blinding_factors() + 1)
    if assignment is None:
        assignment = Assignment(cs, n, usable, instances)
        log.info("keygen_accel: synthesizing (n=%d)...", n)
        circuit.synthesize(config, assignment)
    log.info("keygen_accel: witness ready; %d copies", len(assignment.copies))

    keep = (lambda x: np.asarray(x)) if spill else (lambda x: x)
    domain = Domain(k)
    fixed_lagrange = [keep(ints_to_mont(col)) for col in assignment.fixed]
    fixed_coeff = [keep(_intt(np_to_dev(col), k)) for col in fixed_lagrange]

    # permutation mapping: cycle-splice union-find over flat numpy arrays
    cols = cs.permutation_columns
    ncols = len(cols)
    col_pos = {c: i for i, c in enumerate(cols)}
    size = ncols * n
    # plain Python lists: per-element numpy indexing in this 4M-iteration
    # loop is ~10x slower than list indexing
    map_list = list(range(size))  # mapping[cell] -> cell'
    aux = list(range(size))

    def find(cell: int) -> int:
        root = cell
        while aux[root] != root:
            root = aux[root]
        while aux[cell] != root:  # path compression
            aux[cell], cell = root, aux[cell]
        return root

    for col_a, row_a, col_b, row_b in assignment.copies:
        a = col_pos[col_a] * n + row_a
        b = col_pos[col_b] * n + row_b
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        map_list[a], map_list[b] = map_list[b], map_list[a]
        aux[ra] = rb
    map_flat = np.asarray(map_list, dtype=np.int64)
    del map_list, aux

    log.info("keygen_accel: permutation mapping built")
    # sigma[c][r] = delta^{mc} * omega^{mr} where (mc, mr) = mapping[c][r]
    omega_pows_std = np.asarray(m_from_mont(mont_powers(domain.omega, n)))
    delta_std = ints_to_std([pow(FR_DELTA, c, R) for c in range(ncols)])
    mc = (map_flat // n).astype(np.int64).reshape(ncols, n)
    mr = (map_flat % n).astype(np.int64).reshape(ncols, n)
    sigmas_lagrange = []
    for ci in range(ncols):
        om = jnp.asarray(omega_pows_std[mr[ci]])
        dl = jnp.asarray(delta_std[mc[ci]])
        sigmas_lagrange.append(keep(
            m_mul(m_to_mont(om), m_to_mont(dl))))
    sigmas_coeff = [keep(_intt(np_to_dev(s), k)) for s in sigmas_lagrange]

    log.info("keygen_accel: sigmas done; committing %d fixed + %d sigma cols",
             len(fixed_coeff), len(sigmas_coeff))
    fixed_commitments = []
    for ci, c in enumerate(fixed_coeff):
        fixed_commitments.append(params.commit_coeff_mont(c))
        log.info("keygen_accel: fixed commit %d/%d", ci + 1, len(fixed_coeff))
    permutation_commitments = []
    for ci, sc in enumerate(sigmas_coeff):
        permutation_commitments.append(params.commit_coeff_mont(sc))
        log.info("keygen_accel: sigma commit %d/%d", ci + 1, len(sigmas_coeff))
    log.info("keygen_accel: commitments done")

    vk = VerifyingKey(
        k=k, cs=cs,
        fixed_commitments=fixed_commitments,
        permutation_commitments=permutation_commitments,
    )
    apk = AccelPk(vk, domain, fixed_lagrange, fixed_coeff,
                  sigmas_lagrange, sigmas_coeff)
    return vk, apk


# ---------------------------------------------------------------------------
# The prover
# ---------------------------------------------------------------------------

def _intt(arr, k):
    return ntt_dev(arr, k, inverse=True)


def _ntt(arr, k):
    return ntt_dev(arr, k, inverse=False)


def _bcast(scalar_mont, n):
    return jnp.broadcast_to(scalar_mont, (n, 16))


def create_proof_accel(
    apk: AccelPk,
    params: AccelParams,
    circuits: list,
    instances_per_proof: list[list[list[int]]],
    transcript,
    seed: int = 0,
    spill: bool = False,
) -> bytes:
    """Drop-in accelerated replacement for prover.prove.create_proof:
    identical transcript bytes for identical inputs/seed.

    spill=True keeps every long-lived polynomial on the host (numpy) and only
    transients on device — required at the aggregator's k=22, where the full
    working set (tens of (4M,16) vectors) exceeds one chip's HBM. Device ops
    accept numpy operands, so the compute path is unchanged."""
    from ..protocol.plonk import ConstraintSystem as _CS

    keep = (lambda x: np.asarray(x)) if spill else (lambda x: x)

    vk = apk.vk
    cs = vk.cs
    domain = apk.domain
    k, n = domain.k, domain.n
    bf = cs.blinding_factors()
    usable = n - (bf + 1)
    num_proofs = len(instances_per_proof)
    rng = _random.Random(seed)

    def rand_fr() -> int:
        return rng.randrange(R)

    one_v = _bcast(mont_scalar(1), n)

    # -- 0. vk digest ------------------------------------------------------
    transcript.common_scalar(vk.transcript_repr())

    # -- 1. instances ------------------------------------------------------
    instance_lagrange = []  # [proof][col] device (n,16) mont
    instance_coeff = []
    for insts in instances_per_proof:
        assert len(insts) == cs.num_instance_columns
        cols_l, cols_c = [], []
        for vals in insts:
            assert len(vals) <= usable
            col = ints_to_mont(list(vals) + [0] * (n - len(vals)))
            cols_l.append(keep(col))
            cols_c.append(keep(_intt(col, k)))
            transcript.common_point(params.commit_lagrange_ints(list(vals)))
        instance_lagrange.append(cols_l)
        instance_coeff.append(cols_c)

    # -- 2. advice: per-phase synthesis -> blind -> commit -> challenges ---
    # (mirrors prove.py exactly, including the blinding RNG call order)
    advice_lagrange = [[None] * cs.num_advice_columns for _ in range(num_proofs)]
    advice_coeff = [[None] * cs.num_advice_columns for _ in range(num_proofs)]
    assert len(circuits) == num_proofs
    challenges: dict[int, int] = {}
    for phase in cs.phases():
        for p in range(num_proofs):
            config = circuits[p].configure(_CS())
            assignment = Assignment(cs, n, usable, instances_per_proof[p],
                                    challenges=challenges)
            circuits[p].synthesize(config, assignment)
            for col_idx, col_phase in enumerate(cs.advice_column_phase):
                if col_phase == phase:
                    col = list(assignment.advice[col_idx])
                    for r in range(usable, n):
                        col[r] = rand_fr()
                    lag = ints_to_mont(col)
                    advice_lagrange[p][col_idx] = keep(lag)
                    advice_coeff[p][col_idx] = keep(_intt(lag, k))
                    transcript.write_point(
                        params.commit_coeff_mont(advice_coeff[p][col_idx]))
        for ch_idx, ch_phase in enumerate(cs.challenge_phase):
            if ch_phase == phase:
                challenges[ch_idx] = transcript.squeeze_challenge()
        log.info("accel prove: phase %d advice committed", phase)
    challenge_list = [challenges.get(i, 0) for i in range(cs.num_challenges)]

    theta = transcript.squeeze_challenge()

    # -- expression evaluation over Lagrange rows (device) ----------------
    def eval_expr_rows(expr: Expression, p: int):
        return expr.evaluate(
            constant=lambda v: _bcast(mont_scalar(v), n),
            fixed=lambda q: jnp.roll(apk.fixed_lagrange[cs.fixed_queries[q][0]],
                                     -cs.fixed_queries[q][1], axis=0),
            advice=lambda q: jnp.roll(advice_lagrange[p][cs.advice_queries[q][0]],
                                      -cs.advice_queries[q][1], axis=0),
            instance=lambda q: jnp.roll(instance_lagrange[p][cs.instance_queries[q][0]],
                                        -cs.instance_queries[q][1], axis=0),
            challenge=lambda i: _bcast(mont_scalar(challenge_list[i]), n),
            neg=lambda a: m_sub(jnp.zeros_like(a), a),
            add=lambda a, b: m_add(a, b),
            mul=lambda a, b: m_mul(a, b),
            scale=lambda a, s: m_mul(a, _bcast(mont_scalar(s), n)),
        )

    def compress(exprs: list[Expression], p: int):
        theta_b = _bcast(mont_scalar(theta), n)
        out = jnp.zeros((n, 16), dtype=jnp.uint32)
        for e in exprs:
            out = m_add(m_mul(out, theta_b), eval_expr_rows(e, p))
        return out

    # -- 3. lookups: permuted pairs ---------------------------------------
    lookups_data = []  # [proof][lookup] dict of device vectors
    for p in range(num_proofs):
        per_proof = []
        for arg in cs.lookups:
            a_rows = compress(arg.input_expressions, p)
            s_rows = compress(arg.table_expressions, p)
            a_ints = mont_to_ints(a_rows)
            s_ints = mont_to_ints(s_rows)
            a_perm, s_perm = _permute_pair(a_ints[:usable], s_ints[:usable])
            a_perm = a_perm + [rand_fr() for _ in range(n - usable)]
            s_perm = s_perm + [rand_fr() for _ in range(n - usable)]
            per_proof.append(dict(
                a_rows=keep(a_rows), s_rows=keep(s_rows),
                a_perm=keep(ints_to_mont(a_perm)),
                s_perm=keep(ints_to_mont(s_perm))))
        lookups_data.append(per_proof)

    for p in range(num_proofs):
        for lk in lookups_data[p]:
            lk["a_coeff"] = keep(_intt(np_to_dev(lk["a_perm"]), k))
            lk["s_coeff"] = keep(_intt(np_to_dev(lk["s_perm"]), k))
            transcript.write_point(params.commit_coeff_mont(lk["a_coeff"]))
            transcript.write_point(params.commit_coeff_mont(lk["s_coeff"]))

    log.info("accel prove: lookup permuted pairs committed")
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()
    beta_b = _bcast(mont_scalar(beta), n)
    gamma_b = _bcast(mont_scalar(gamma), n)

    # -- 4. permutation z polynomials (log-depth grand products) ----------
    chunk_len = cs.permutation_chunk_len()
    perm_cols = cs.permutation_columns
    omega_pows = mont_powers(domain.omega, n)

    def col_rows_dev(col, p):
        if col.kind == "advice":
            return advice_lagrange[p][col.index]
        if col.kind == "fixed":
            return apk.fixed_lagrange[col.index]
        return instance_lagrange[p][col.index]

    def grand_product(num, den, z0: int, tail_draws: list[int]):
        """z[0]=z0, z[i+1] = z[i] * num[i]/den[i] for i < usable; returns the
        device Lagrange vector with the random tail and z[usable] (int)."""
        inv_den = _batch_inv(den)
        ratio = m_mul(num, inv_den)
        cp = _cumprod_mont(ratio)  # cp[i] = prod_{j<=i} ratio[j]
        z0_b = _bcast(mont_scalar(z0), n)
        cp = m_mul(cp, z0_b)
        # z = [z0, z0*cp[0], ..., z0*cp[usable-1], tail...]
        z = jnp.concatenate([z0_b[:1], cp[:usable]], axis=0)
        z_last = mont_to_ints(z[usable : usable + 1])[0]
        tail = ints_to_mont(tail_draws) if tail_draws else jnp.zeros((0, 16), jnp.uint32)
        z = jnp.concatenate([z, tail], axis=0)
        assert z.shape[0] == n
        return z, z_last

    usable_mask = np.zeros((n, 1), dtype=np.uint32)
    usable_mask[:usable] = 1
    usable_mask_d = jnp.asarray(usable_mask)

    perm_z = []  # [proof][set] device Lagrange
    for p in range(num_proofs):
        sets = []
        last_z = 1
        for chunk_idx in range(0, len(perm_cols), chunk_len):
            chunk = perm_cols[chunk_idx : chunk_idx + chunk_len]
            num = one_v
            den = one_v
            for j, col in enumerate(chunk):
                v = col_rows_dev(col, p)
                sigma = apk.sigmas_lagrange[chunk_idx + j]
                do = m_mul(
                    omega_pows,
                    _bcast(mont_scalar(pow(FR_DELTA, chunk_idx + j, R)), n))
                num = m_mul(num, fo.add(
                    FR16, v, m_add(m_mul(beta_b, do), gamma_b)))
                den = m_mul(den, fo.add(
                    FR16, v, m_add(m_mul(beta_b, sigma), gamma_b)))
            # mask the blinded tail out of the product (den=num=1 there)
            num = m_select((usable_mask_d[:, 0] == 1), num, one_v)
            den = m_select((usable_mask_d[:, 0] == 1), den, one_v)
            tail = [rand_fr() for _ in range(n - usable - 1)]
            z, last_z = grand_product(num, den, last_z, tail)
            sets.append(keep(z))
        perm_z.append(sets)

    perm_z_coeff = [[keep(_intt(np_to_dev(z), k)) for z in sets]
                    for sets in perm_z]
    for p in range(num_proofs):
        for zc in perm_z_coeff[p]:
            transcript.write_point(params.commit_coeff_mont(zc))

    # -- 5. lookup z polynomials ------------------------------------------
    for p in range(num_proofs):
        for lk in lookups_data[p]:
            num = m_mul(m_add(lk["a_rows"], beta_b),
                              m_add(lk["s_rows"], gamma_b))
            den = m_mul(m_add(lk["a_perm"], beta_b),
                              m_add(lk["s_perm"], gamma_b))
            num = m_select((usable_mask_d[:, 0] == 1), num, one_v)
            den = m_select((usable_mask_d[:, 0] == 1), den, one_v)
            tail = [rand_fr() for _ in range(n - usable - 1)]
            z, _ = grand_product(num, den, 1, tail)
            lk["z"] = keep(z)
    for p in range(num_proofs):
        for lk in lookups_data[p]:
            lk["z_coeff"] = keep(_intt(np_to_dev(lk["z"]), k))
            transcript.write_point(params.commit_coeff_mont(lk["z_coeff"]))

    # -- 6. vanishing random poly -----------------------------------------
    random_ints = [rand_fr() for _ in range(n)]
    random_poly = keep(ints_to_mont(random_ints))
    transcript.write_point(params.commit_coeff_mont(random_poly))

    y = transcript.squeeze_challenge()
    log.info("accel prove: grand products committed; computing quotient h")

    # -- 7. quotient h via coset-sharded evaluation -----------------------
    h_chunks = _compute_h_sharded(
        apk, num_proofs, advice_coeff, instance_coeff, lookups_data,
        perm_z_coeff, challenge_list, theta, beta, gamma, y, spill=spill)
    h_chunks = [keep(c) for c in h_chunks]
    qd = vk.quotient_poly_degree()
    assert len(h_chunks) >= qd
    h_pieces = h_chunks[:qd]
    for piece in h_pieces:
        transcript.write_point(params.commit_coeff_mont(piece))

    log.info("accel prove: h committed")
    x = transcript.squeeze_challenge()
    xn = pow(x, n, R)

    xn_b = _bcast(mont_scalar(xn), n)
    h_folded = jnp.zeros((n, 16), dtype=jnp.uint32)
    for piece in reversed(h_pieces):
        h_folded = m_add(m_mul(h_folded, xn_b), piece)

    # -- 8. evaluations ----------------------------------------------------
    def poly_for(ref: tuple):
        kind = ref[0]
        if kind == "instance":
            return instance_coeff[ref[1]][ref[2]]
        if kind == "advice":
            return advice_coeff[ref[1]][ref[2]]
        if kind == "perm_z":
            return perm_z_coeff[ref[1]][ref[2]]
        if kind == "lookup_z":
            return lookups_data[ref[1]][ref[2]]["z_coeff"]
        if kind == "lookup_a":
            return lookups_data[ref[1]][ref[2]]["a_coeff"]
        if kind == "lookup_s":
            return lookups_data[ref[1]][ref[2]]["s_coeff"]
        if kind == "fixed":
            return apk.fixed_coeff[ref[1]]
        if kind == "sigma":
            return apk.sigmas_coeff[ref[1]]
        if kind == "h":
            return h_folded
        if kind == "random":
            return random_poly
        raise KeyError(ref)

    from collections import OrderedDict
    powers_cache: OrderedDict = OrderedDict()
    powers_cap = 4 if spill else None  # each vector is n*64B of HBM

    def powers_of(z: int):
        if z in powers_cache:
            powers_cache.move_to_end(z)
            return powers_cache[z]
        val = mont_powers(z, n)
        powers_cache[z] = val
        if powers_cap is not None and len(powers_cache) > powers_cap:
            powers_cache.popitem(last=False)
        return val

    def ev(poly, z: int) -> int:
        return _eval_at(poly, powers_of(z))

    for p in range(num_proofs):
        for (col, rot) in cs.instance_queries:
            transcript.write_scalar(ev(instance_coeff[p][col], domain.rotate_omega(x, rot)))
    for p in range(num_proofs):
        for (col, rot) in cs.advice_queries:
            transcript.write_scalar(ev(advice_coeff[p][col], domain.rotate_omega(x, rot)))
    for (col, rot) in cs.fixed_queries:
        transcript.write_scalar(ev(apk.fixed_coeff[col], domain.rotate_omega(x, rot)))
    transcript.write_scalar(ev(random_poly, x))
    for s in apk.sigmas_coeff:
        transcript.write_scalar(ev(s, x))
    x_next = domain.rotate_omega(x, 1)
    x_last = domain.rotate_omega(x, -(bf + 1))
    for p in range(num_proofs):
        nsets = len(perm_z_coeff[p])
        for s_idx, zc in enumerate(perm_z_coeff[p]):
            transcript.write_scalar(ev(zc, x))
            transcript.write_scalar(ev(zc, x_next))
            if s_idx + 1 < nsets:
                transcript.write_scalar(ev(zc, x_last))
    x_inv = domain.rotate_omega(x, -1)
    for p in range(num_proofs):
        for lk in lookups_data[p]:
            transcript.write_scalar(ev(lk["z_coeff"], x))
            transcript.write_scalar(ev(lk["z_coeff"], x_next))
            transcript.write_scalar(ev(lk["a_coeff"], x))
            transcript.write_scalar(ev(lk["a_coeff"], x_inv))
            transcript.write_scalar(ev(lk["s_coeff"], x))

    log.info("accel prove: evaluations written")
    v = transcript.squeeze_challenge()
    v_b = _bcast(mont_scalar(v), n)

    # -- 9. GWC multiopen: NTT-form Kate division per rotation set --------
    plan = query_plan(vk, num_proofs)
    for rot, refs in rotation_sets(plan):
        z = domain.rotate_omega(x, rot)
        q = jnp.zeros((n, 16), dtype=jnp.uint32)
        for ref in reversed(refs):
            q = m_add(m_mul(q, v_b), poly_for(ref))
        qz = ev(q, z)
        # w(omega^i) = (q(omega^i) - q(z)) / (omega^i - z)
        q_evals = _ntt(q, k)
        den = m_sub(omega_pows, _bcast(mont_scalar(z), n))
        w_lag = m_mul(
            m_sub(q_evals, _bcast(mont_scalar(qz), n)),
            _batch_inv(den))
        w_coeff = _intt(w_lag, k)
        transcript.write_point(params.commit_coeff_mont(w_coeff))
        log.info("accel prove: opening for rotation %d committed", rot)

    return transcript.finalize()


# ---------------------------------------------------------------------------
# Coset-sharded quotient evaluation
# ---------------------------------------------------------------------------

def _compute_h_sharded(
    apk: AccelPk, num_proofs: int, advice_coeff, instance_coeff,
    lookups_data, perm_z_coeff, challenges: list[int],
    theta: int, beta: int, gamma: int, y: int, spill: bool = False,
) -> list[jnp.ndarray]:
    """Quotient computation on the extended coset domain, one size-n shard at
    a time. Returns the h coefficient chunks [h_0..h_{ratio-1}] (each (n,16)
    Montgomery device arrays), low chunk first.

    Shard s holds evaluations at {zeta * w_ext^s * omega^t}_t. A rotation by
    `rot` rows is a roll by -rot within the shard; the vanishing polynomial
    X^n - 1 is the constant zeta^n * w_ext^{sn} - 1 on shard s.
    """
    vk = apk.vk
    cs = vk.cs
    domain = apk.domain
    k, n = domain.k, domain.n
    bf = cs.blinding_factors()
    usable = n - (bf + 1)
    chunk_len = cs.permutation_chunk_len()

    deg = cs.degree()
    ratio = 1
    while ratio * n < max((deg - 1), 1) * n:
        ratio *= 2
    k_ext = k + (ratio.bit_length() - 1)
    w_ext = omega_for_k(k_ext)
    zeta = FR_GENERATOR
    assert pow(zeta, 1 << k_ext, R) != 1

    # l0 / l_last / l_blind coefficient forms (INTT of indicator vectors)
    e0 = np.zeros(n, dtype=np.int64); e0[0] = 1
    el = np.zeros(n, dtype=np.int64); el[usable] = 1
    eb = np.zeros(n, dtype=np.int64); eb[usable + 1 :] = 1
    l0_c = ntt_dev(m_to_mont(jnp.asarray(ints_to_std(e0.tolist()))), k, inverse=True)
    ll_c = ntt_dev(m_to_mont(jnp.asarray(ints_to_std(el.tolist()))), k, inverse=True)
    lb_c = ntt_dev(m_to_mont(jnp.asarray(ints_to_std(eb.tolist()))), k, inverse=True)

    y_b = _bcast(mont_scalar(y), n)
    theta_b = _bcast(mont_scalar(theta), n)
    beta_b = _bcast(mont_scalar(beta), n)
    gamma_b = _bcast(mont_scalar(gamma), n)
    one_b = _bcast(mont_scalar(1), n)

    x_poly_c = _omega_x_coeff(domain)  # coefficient form of p(X) = X

    shards = []  # F_s = INTT(shard evals of h)
    for s in range(ratio):
        coset = zeta * pow(w_ext, s, R) % R
        scale = mont_powers(coset, n)
        # LRU-capped under spill: the full extended working set (~35 (n,16)
        # arrays) exceeds HBM at k=22; misses re-run one size-n NTT
        from collections import OrderedDict
        ext_cache: OrderedDict = OrderedDict()
        cache_cap = 16 if spill else None

        def ext(coeff_arr):
            key = id(coeff_arr)
            if key in ext_cache:
                ext_cache.move_to_end(key)
                return ext_cache[key]
            val = ntt_dev(m_mul(np_to_dev(coeff_arr), scale), k)
            ext_cache[key] = val
            if cache_cap is not None and len(ext_cache) > cache_cap:
                ext_cache.popitem(last=False)
            return val

        def roll(arr, rot):
            return jnp.roll(arr, -rot, axis=0) if rot else arr

        l0_e = ext(l0_c)
        ll_e = ext(ll_c)
        lb_e = ext(lb_c)
        active = m_sub(one_b, m_add(ll_e, lb_e))  # 1 - (l_last+l_blind)

        acc = jnp.zeros((n, 16), dtype=jnp.uint32)

        def fold(e):
            nonlocal acc
            acc = m_add(m_mul(acc, y_b), e)

        for p in range(num_proofs):
            def expr_ext(e: Expression):
                return e.evaluate(
                    constant=lambda vv: _bcast(mont_scalar(vv), n),
                    fixed=lambda q: roll(ext(apk.fixed_coeff[cs.fixed_queries[q][0]]),
                                         cs.fixed_queries[q][1]),
                    advice=lambda q: roll(ext(advice_coeff[p][cs.advice_queries[q][0]]),
                                          cs.advice_queries[q][1]),
                    instance=lambda q: roll(ext(instance_coeff[p][cs.instance_queries[q][0]]),
                                            cs.instance_queries[q][1]),
                    challenge=lambda i: _bcast(mont_scalar(challenges[i]), n),
                    neg=lambda a: m_sub(jnp.zeros_like(a), a),
                    add=lambda a, b: m_add(a, b),
                    mul=lambda a, b: m_mul(a, b),
                    scale=lambda a, sc: m_mul(a, _bcast(mont_scalar(sc), n)),
                )

            # gates
            for _, polys in cs.gates:
                for g in polys:
                    fold(expr_ext(g))

            # permutation expressions
            sets_e = [ext(zc) for zc in perm_z_coeff[p]]
            if sets_e:
                z0 = sets_e[0]
                fold(m_mul(l0_e, m_sub(one_b, z0)))
                zl = sets_e[-1]
                fold(m_mul(ll_e,
                                 m_sub(m_mul(zl, zl), zl)))
                for s_idx in range(1, len(sets_e)):
                    prev_rot = roll(sets_e[s_idx - 1], -(bf + 1))
                    fold(m_mul(m_sub(sets_e[s_idx], prev_rot), l0_e))
                omega_do = ext(x_poly_c)  # evals of the poly X
                for chunk_idx0, chunk_start in enumerate(
                        range(0, len(cs.permutation_columns), chunk_len)):
                    chunk = cs.permutation_columns[chunk_start : chunk_start + chunk_len]
                    zc_e = sets_e[chunk_idx0]
                    left = roll(zc_e, 1)
                    right = zc_e
                    delta_pow = pow(FR_DELTA, chunk_idx0 * chunk_len, R)
                    for j, col in enumerate(chunk):
                        qidx = cs.get_any_query_index(col, 0)
                        if col.kind == "advice":
                            vp = ext(advice_coeff[p][cs.advice_queries[qidx][0]])
                        elif col.kind == "fixed":
                            vp = ext(apk.fixed_coeff[cs.fixed_queries[qidx][0]])
                        else:
                            vp = ext(instance_coeff[p][cs.instance_queries[qidx][0]])
                        sigma_e = ext(apk.sigmas_coeff[chunk_start + j])
                        left = m_mul(left, fo.add(
                            FR16, vp, m_add(m_mul(beta_b, sigma_e), gamma_b)))
                        dx = m_mul(
                            omega_do,
                            _bcast(mont_scalar(beta * delta_pow % R), n))
                        right = m_mul(right,
                                            m_add(vp, m_add(dx, gamma_b)))
                        delta_pow = delta_pow * FR_DELTA % R
                    fold(m_mul(m_sub(left, right), active))

            # lookup expressions
            for lk_idx, lk in enumerate(lookups_data[p]):
                arg = cs.lookups[lk_idx]
                zc_e = ext(lk["z_coeff"])
                ac_e = ext(lk["a_coeff"])
                sc_e = ext(lk["s_coeff"])
                z_next = roll(zc_e, 1)
                a_prev = roll(ac_e, -1)
                input_e = jnp.zeros((n, 16), dtype=jnp.uint32)
                for e in arg.input_expressions:
                    input_e = m_add(m_mul(input_e, theta_b), expr_ext(e))
                table_e = jnp.zeros((n, 16), dtype=jnp.uint32)
                for e in arg.table_expressions:
                    table_e = m_add(m_mul(table_e, theta_b), expr_ext(e))
                fold(m_mul(l0_e, m_sub(one_b, zc_e)))
                fold(m_mul(ll_e,
                                 m_sub(m_mul(zc_e, zc_e), zc_e)))
                left = m_mul(z_next, m_mul(
                    m_add(ac_e, beta_b), m_add(sc_e, gamma_b)))
                right = m_mul(zc_e, m_mul(
                    m_add(input_e, beta_b), m_add(table_e, gamma_b)))
                fold(m_mul(m_sub(left, right), active))
                a_minus_s = m_sub(ac_e, sc_e)
                fold(m_mul(l0_e, a_minus_s))
                fold(m_mul(m_mul(
                    a_minus_s, m_sub(ac_e, a_prev)), active))

        # divide by the vanishing constant zeta^n * w_ext^{sn} - 1
        log.info("accel prove: quotient shard %d/%d evaluated", s + 1, ratio)
        vanish = (pow(zeta, n, R) * pow(w_ext, s * n, R) - 1) % R
        inv_vanish = _bcast(mont_scalar(pow(vanish, -1, R)), n)
        h_evals = m_mul(acc, inv_vanish)
        shards.append(ntt_dev(h_evals, k, inverse=True))

    # recombine shards into coefficient chunks:
    # F_s[m] = w_ext^{sm} * sum_u d[m,u] * phi^{su},  phi = w_ext^n,
    # d[m,u] = c[m+un] * zeta^(m+un)
    phi = pow(w_ext, n, R)
    g_vecs = []
    for s in range(ratio):
        ws_inv = pow(pow(w_ext, s, R), -1, R) if s else 1
        g_vecs.append(m_mul(shards[s], mont_powers(ws_inv, n)))
    ratio_inv = pow(ratio, -1, R)
    zeta_inv = pow(zeta, -1, R)
    zeta_inv_pows = mont_powers(zeta_inv, n)
    chunks = []
    for u in range(ratio):
        d_u = jnp.zeros((n, 16), dtype=jnp.uint32)
        for s in range(ratio):
            w = pow(pow(phi, s * u, R), -1, R) * ratio_inv % R
            d_u = m_add(d_u, m_mul(g_vecs[s], _bcast(mont_scalar(w), n)))
        # c[m+un] = d[m,u] * zeta^{-(m+un)}
        c_u = m_mul(d_u, zeta_inv_pows)
        c_u = m_mul(c_u, _bcast(mont_scalar(pow(zeta_inv, u * n, R)), n))
        chunks.append(c_u)
    return chunks


def _omega_x_coeff(domain: Domain):
    """Coefficient form of the polynomial p(X) = X (for the permutation
    right-side beta * delta^j * X term)."""
    n = domain.n
    coeffs = [0] * n
    coeffs[1] = 1
    return ints_to_mont(coeffs)
