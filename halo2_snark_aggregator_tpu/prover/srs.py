"""Accelerated SRS generation: device fixed-base batch scalar-mul.

`ParamsKZG.unsafe_setup` (the HALO2_PARAMS_{k} analog, verify_circuit.rs:
701-731) computes [tau^i]G1 with one host scalar-mul per element — infeasible
at the aggregator's k=22 (4M points). Here the whole basis is produced by a
fixed-base windowed multi-scalar kernel shaped for the MXU:

  * 8-bit windows over 256-bit scalars -> 32 digit positions;
  * a tiny host-precomputed table T[j][d] = d * 2^(8j) * G (32 x 256 points,
    ~8k host group ops);
  * per position, the table row is SELECTED by a one-hot matmul
    (digits -> one-hot(256) @ table-limbs) — redundant-representation
    Montgomery limbs are < 2^8, so f32 accumulation is exact and the
    selection rides the MXU instead of lowering to per-element gathers
    (TPU gathers are scalar loads — see ops/msm.host_bucket_plan);
  * the 32 selected points per element are summed with a log-depth tree of
    complete RCB adds (ops/curve_rr).

Bit-exact contract: same tau derivation as ParamsKZG.unsafe_setup, identical
points — differentially tested at small k.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from ..ops import curve_rr as cv
from ..ops import field_rr as frr
from ..ops import msm as msm_ops
from .accel import AccelParams, ints_to_std, np_to_dev
from .domain import Domain
from .kzg import ParamsKZG

WINDOW = 8
POSITIONS = 256 // WINDOW  # 32


def _host_tables(base=ff.G1_GEN):
    """T[j][d] = d * 2^(8j) * base as affine int points (None = identity)."""
    tables = []
    b = base
    for _ in range(POSITIONS):
        row = [None, b]
        acc = b
        for _ in range(2, 1 << WINDOW):
            acc = ff.g1_add(acc, b)
            row.append(acc)
        tables.append(row)
        for _ in range(WINDOW):
            b = ff.g1_double(b)
    return tables


def _tables_mont_limbs(tables) -> np.ndarray:
    """(POSITIONS, 256, 96) f32 of redundant Montgomery limbs (x|y|z)."""
    out = np.zeros((POSITIONS, 1 << WINDOW, 3 * frr.NLIMBS), dtype=np.float32)
    for j, row in enumerate(tables):
        for d, pt in enumerate(row):
            if pt is None:
                x, y, z = 0, 1, 0
            else:
                x, y, z = pt[0], pt[1], 1
            out[j, d, : frr.NLIMBS] = frr.FQ.to_mont_int(x)
            out[j, d, frr.NLIMBS : 2 * frr.NLIMBS] = frr.FQ.to_mont_int(y)
            out[j, d, 2 * frr.NLIMBS :] = frr.FQ.to_mont_int(z)
    return out


def _digits_u8(scalars_std: np.ndarray) -> np.ndarray:
    """uint32[n,16] 16-bit limbs -> uint8[n, 32] base-256 digits."""
    lo = (scalars_std & 0xFF).astype(np.uint8)
    hi = (scalars_std >> 8).astype(np.uint8)
    return np.stack([lo, hi], axis=-1).reshape(scalars_std.shape[0], 32)


def fixed_base_msm(scalars_std: np.ndarray, tables_f32: np.ndarray,
                   chunk: int = 1 << 15) -> tuple:
    """[s_i * G for each scalar] as a projective RR triple on device.

    Staged as several SMALL jitted programs (one-hot select; one pairwise
    complete-add per tree level) — a single fused program with 31 unrolled
    RCB adds wedges the axon compiler for tens of minutes (same lesson as
    msm_staged / the 'no minutes-long XLA program' rule)."""
    import jax

    n = scalars_std.shape[0]
    digits = _digits_u8(scalars_std)

    @jax.jit
    def select(dig_chunk, tables):
        # (m, 32) digits -> one-hot -> exact selection by matmul (one-hot
        # rows have a single 1; limb values are < 2^8, bf16-exact)
        onehot = jax.nn.one_hot(dig_chunk, 1 << WINDOW, dtype=jnp.float32)
        sel = jnp.einsum("mjd,jdl->mjl", onehot, tables,
                         precision=jax.lax.Precision.HIGHEST)  # (m, 32, 96)
        sel = sel.astype(jnp.int32)
        return (frr.RR(sel[..., : frr.NLIMBS], 8),
                frr.RR(sel[..., frr.NLIMBS : 2 * frr.NLIMBS], 8),
                frr.RR(sel[..., 2 * frr.NLIMBS :], 8))

    @jax.jit
    def level_add(pts):
        m = pts[0].limbs.shape[1]
        half = m // 2
        a = tuple(frr.RR(c.limbs[:, :half], c.bound) for c in pts)
        b = tuple(frr.RR(c.limbs[:, half:m], c.bound) for c in pts)
        return tuple(frr.with_bound(c, msm_ops.CARRY_BOUND)
                     for c in cv.add(a, b))

    tb = jnp.asarray(tables_f32)
    host_chunks = []  # per-chunk (3, m, 32) int32 — small bounded transfers
    bound = None
    for lo in range(0, n, chunk):
        pts = select(jnp.asarray(digits[lo : lo + chunk]), tb)
        while pts[0].limbs.shape[1] > 1:
            pts = level_add(pts)
        bound = pts[0].bound
        host_chunks.append(np.stack(
            [np.asarray(c.limbs[:, 0], dtype=np.int32) for c in pts]))
    host = np.concatenate(host_chunks, axis=1)  # (3, n, 32)
    dev = tuple(frr.RR(np_to_dev(host[i]), bound) for i in range(3))
    return dev, host


def _tau_for(k: int, seed: bytes) -> int:
    return int.from_bytes(
        hashlib.sha256(seed + k.to_bytes(4, "little")).digest(), "little") % ff.R


def unsafe_setup_accel(k: int, seed: bytes = b"halo2-snark-aggregator-tpu",
                       lagrange_prefix: int = 4096) -> AccelParams:
    """Device-generated unsafe SRS; same tau/points as ParamsKZG.unsafe_setup."""
    tau = _tau_for(k, seed)
    n = 1 << k
    taus = [1] * n
    for i in range(1, n):
        taus[i] = taus[i - 1] * tau % ff.R
    tables = _host_tables()
    _g_dev_proj, g_host_proj = fixed_base_msm(ints_to_std(taus),
                                              _tables_mont_limbs(tables))
    # normalize to affine (z = 1) before anything consumes the basis: the
    # Pallas MSM's table repack requires affine rows (see _affine_rr_limbs)
    g_host = _affine_rr_limbs(g_host_proj)
    g_dev = tuple(frr.RR(np_to_dev(g_host[i]), 12) for i in range(3))

    # Lagrange-basis prefix for (small) instance-column commitments:
    # L_i(tau) = (omega^i / n) (tau^n - 1) / (tau - omega^i)
    dom = Domain(k)
    m = min(n, lagrange_prefix)
    tau_n = pow(tau, n, ff.R)
    n_inv = pow(n, -1, ff.R)
    g_lagrange = []
    w = 1
    for _ in range(m):
        li = w * n_inv % ff.R * (tau_n - 1) % ff.R * pow(tau - w, -1, ff.R) % ff.R
        g_lagrange.append(ff.g1_mul(ff.G1_GEN, li))
        w = w * dom.omega % ff.R
    p = AccelParams(k, g_dev, ff.G2_GEN, ff.g2_mul(ff.G2_GEN, tau), g_lagrange)
    p.g_host_limbs = g_host  # (3, n, 32) Montgomery RR limbs for disk caching
    return p


def _affine_rr_limbs(limbs: np.ndarray) -> np.ndarray:
    """(3, n, 32) projective Montgomery RR limbs -> same, normalized to
    z = 1 (identity rows stay (0, 1, 0)).

    Why: the Pallas MSM consumes tables through `table_from_rr`, whose
    affine repack silently mis-reads projective rows — the round-4 k=21
    keygen committed through exactly that path and emitted off-curve
    points for every commitment (the fixed_base_msm add tree leaves
    z != 1). One host batch inversion (~73 s at 2^21) at SRS build/load
    time makes every downstream consumer's affine assumption true."""
    host = tuple(frr.RR(np.asarray(limbs[i]), 12) for i in range(3))
    pts = cv.to_affine_ints(host)
    jx, jy, jz = cv.from_affine_ints(pts)
    return np.stack([np.asarray(jx.limbs, dtype=np.int32),
                     np.asarray(jy.limbs, dtype=np.int32),
                     np.asarray(jz.limbs, dtype=np.int32)])


def _is_affine_sample(limbs: np.ndarray, samples: int = 64) -> bool:
    """True iff sampled rows all have z = Montgomery 1 or z = 0 (identity)."""
    z = np.asarray(limbs[2])
    n = z.shape[0]
    idx = np.linspace(0, n - 1, min(samples, n)).astype(np.int64)
    one = np.asarray(frr.FQ.one_mont)
    zs = z[idx]
    return bool(np.all((zs == one[None, :]).all(axis=1)
                       | (zs == 0).all(axis=1)))


def _srs_cache_path(k: int, cache_dir) -> Path:
    if cache_dir is None:
        cache_dir = Path.home() / ".cache" / "halo2_snark_aggregator_tpu"
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    return cache_dir / f"accel_params_k{k}.npz"


def setup_cached_accel(k: int, cache_dir=None) -> AccelParams:
    """Disk-cached accelerated SRS (HALO2_PARAMS_{k} analog). The cache holds
    canonical-form limb arrays; Montgomery conversion happens on load."""
    path = _srs_cache_path(k, cache_dir)
    if path.exists():
        data = np.load(path, allow_pickle=True)
        limbs = data["g_rr"]  # int32 (3, n, NLIMBS) Montgomery RR limbs
        if not _is_affine_sample(limbs):
            # legacy projective cache (pre round-5): migrate in place
            import sys as _sys
            print(f"srs: migrating projective k={k} SRS cache to affine "
                  f"(one-time host batch inversion)", file=_sys.stderr)
            limbs = _affine_rr_limbs(limbs)
            np.savez(path, g_rr=limbs, g_lagrange=data["g_lagrange"],
                     g2=data["g2"], s_g2=data["s_g2"])
        g_dev = tuple(frr.RR(np_to_dev(limbs[i]), 12) for i in range(3))
        g_lagrange = [None if r[2] == 0 else (int(r[0]), int(r[1]))
                      for r in data["g_lagrange"]]

        def g2_point(vals):
            a = [int(v) for v in vals]
            return (ff.Fq2(a[0], a[1]), ff.Fq2(a[2], a[3]))

        return AccelParams(k, g_dev, g2_point(data["g2"]),
                           g2_point(data["s_g2"]), g_lagrange)
    params = unsafe_setup_accel(k)
    g_rr = params.g_host_limbs  # already affine (unsafe_setup_accel)
    g_lag = np.array(
        [[pt[0], pt[1], 1] if pt is not None else [0, 0, 0]
         for pt in params.g_lagrange], dtype=object)
    def g2_flat(pt):
        return np.array([pt[0].c0, pt[0].c1, pt[1].c0, pt[1].c1], dtype=object)

    g2 = g2_flat(params.g2)
    s_g2 = g2_flat(params.s_g2)
    np.savez(path, g_rr=g_rr, g_lagrange=g_lag, g2=g2, s_g2=s_g2)
    return params
