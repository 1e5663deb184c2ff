"""Radix-2 NTT over BN254 Fr on TPU (JAX).

Vectorized iterative Cooley-Tukey: bit-reversal gather + log2(n) butterfly
stages, each stage one batched Montgomery twiddle-mul + limb add/sub over the
whole array. This is the witness-polynomial synthesis kernel for the
TPU-accelerated prover (SURVEY §2.6: "radix-2 NTT with butterfly stages
exchanged all-to-all across a multi-host pod slice" — the single-chip kernel
here; the multi-host exchange lands with the distributed prover).

Differentially tested against prover/domain.py (host-exact NTT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.bn254 import R
from ..prover.domain import omega_for_k
from . import field as fo

FR = fo.FR


@functools.lru_cache(maxsize=32)
def _plan(k: int, inverse: bool):
    """Host-precomputed NTT plan: bit-reversal indices + per-stage Montgomery
    twiddle tables (stage s has 2^s twiddles, broadcast across blocks)."""
    n = 1 << k
    omega = omega_for_k(k)
    if inverse:
        omega = pow(omega, -1, R)
    bits = k
    # vectorized bit-reversal permutation (a Python format() loop costs ~30s
    # at k=22)
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev = (rev << 1) | ((idx >> b) & 1)
    rev = rev.astype(np.int32)
    # per-stage twiddle tables: host power chains (total n modmuls), one bulk
    # codec + Montgomery conversion on device per stage
    twiddles = []
    length = 2
    while length <= n:
        w_len = pow(omega, n // length, R)
        half = length // 2
        # power chain directly in Montgomery form: seed with mont(1) = 2^256
        # and multiply by the PLAIN w_len (preserves the 2^256 factor)
        pw = [FR.r_mont] * half
        for j in range(1, half):
            pw[j] = pw[j - 1] * w_len % R
        twiddles.append(fo.ints_to_std(pw))
        length <<= 1
    n_inv = FR.to_mont_int(pow(n, -1, R)) if inverse else None
    return rev, twiddles, n_inv


def bitrev_dev(x, k: int, axis: int = 0):
    """Bit-reversal permutation of a 2^k axis ON DEVICE without gathers.

    A 2^k gather lowers to scalar loads on TPU (~100x); instead run k-1
    bounded-rank transposes. Invariant before step j (1-based): the axis
    index reads [b_{k-j} .. b_0 | b_{k-j+1} .. b_{k-1}] (low bits first in
    the tail). Viewing it as (2, 2^{k-j}, 2^{j-1}) and swapping the first
    two axes moves the current top bit down, giving full reversal after
    k-1 steps. Each step is one whole-array copy (HBM-bound), all fusible
    under an enclosing jit."""
    if k <= 1:
        return x
    lead = x.shape[:axis]
    tail = x.shape[axis + 1 :]
    nl = len(lead)
    for j in range(1, k):
        x = x.reshape(*lead, 2, 1 << (k - j), 1 << (j - 1), *tail)
        x = jnp.swapaxes(x, nl, nl + 1)
    return x.reshape(*lead, 1 << k, *tail)


@functools.partial(jax.jit, static_argnames=("k", "inverse"))
def ntt(values, k: int, inverse: bool = False):
    """values: uint32[n, 16] Montgomery Fr; returns same shape.

    Forward: coefficients -> evaluations at omega^i (in-order).
    Inverse: evaluations -> coefficients (includes the 1/n scale)."""
    n = 1 << k
    _, twiddles, n_inv = _plan(k, inverse)
    x = bitrev_dev(values, k)
    for s, tw in enumerate(twiddles):
        half = tw.shape[0]
        length = 2 * half
        blocks = n // length
        x = x.reshape(blocks, length, fo.LIMBS)
        u = x[:, :half]
        v = fo.mont_mul(FR, x[:, half:], jnp.asarray(tw)[None])
        x = jnp.concatenate([fo.add(FR, u, v), fo.sub(FR, u, v)], axis=1)
    x = x.reshape(n, fo.LIMBS)
    if inverse:
        x = fo.mont_mul(FR, x, jnp.broadcast_to(jnp.asarray(n_inv), x.shape))
    return x


# chunked butterfly math: flatten each stage to (n/2, 16) pair vectors and
# run the SAME three row-chunked programs at every stage — per-stage fused
# programs at k=22 OOM on padded temps (u32[...,16] tiles pad 4-8x on TPU)
_mul_c = fo.rowwise_jit(lambda a, b: fo.mont_mul(FR, a, b))
_add_c = fo.rowwise_jit(lambda a, b: fo.add(FR, a, b))
_sub_c = fo.rowwise_jit(lambda a, b: fo.sub(FR, a, b))


def ntt_staged(values, k: int, inverse: bool = False):
    """Large-k NTT: row-chunked butterfly stages, and the bit-reversal
    permutation on HOST when the input is host-resident (a 2^k device gather
    lowers to scalar loads on TPU). Same result as ntt()."""
    n = 1 << k
    rev, twiddles, n_inv = _plan(k, inverse)
    if isinstance(values, np.ndarray):
        x = fo.np_to_dev(values[rev])
    else:
        # device input: gather-free transpose-chain reversal (the axon
        # tunnel moves ~20-60 MB/s — a host round-trip at k=18 costs ~1s)
        x = jax.jit(bitrev_dev, static_argnames=("k",))(values, k=k)
    for tw in twiddles:
        half = tw.shape[0]
        length = 2 * half
        blocks = n // length
        xr = x.reshape(blocks, length, fo.LIMBS)
        u = xr[:, :half].reshape(-1, fo.LIMBS)
        vv = xr[:, half:].reshape(-1, fo.LIMBS)
        tw_full = jnp.broadcast_to(
            jnp.asarray(tw)[None], (blocks, half, fo.LIMBS)
        ).reshape(-1, fo.LIMBS)
        v = _mul_c(vv, tw_full)
        s_lo = _add_c(u, v).reshape(blocks, half, fo.LIMBS)
        s_hi = _sub_c(u, v).reshape(blocks, half, fo.LIMBS)
        x = jnp.concatenate([s_lo, s_hi], axis=1).reshape(n, fo.LIMBS)
    if inverse:
        x = _mul_c(x, jnp.broadcast_to(jnp.asarray(n_inv), x.shape))
    return x


STAGED_K = 16


PALLAS_MIN_K = 11  # ntt_pallas needs n/2 to be a BLOCK (1024) multiple


def _use_pallas() -> bool:
    """Fused Pallas butterflies (ops/ntt_pallas): DEFAULT on real TPU
    (validated bit-exact on v5e; 24x over the per-stage staged path at
    k=18 once twiddles are device-cached). NTT_PALLAS=0 disables,
    NTT_PALLAS=1 forces (interpret mode off-TPU — tests only)."""
    import os

    env = os.environ.get("NTT_PALLAS", "")
    if env == "0":
        return False
    if env:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def ntt_auto(values, k: int, inverse: bool = False):
    """Dispatch: fused Pallas program on TPU for k >= 11; fused jnp program
    for small k (cheap compile); staged per-stage jnp programs as the
    large-k fallback elsewhere."""
    if k >= PALLAS_MIN_K and _use_pallas():
        from .ntt_pallas import ntt_pallas

        return ntt_pallas(values, k, inverse)
    if k < STAGED_K:
        return ntt(jnp.asarray(values), k, inverse)
    return ntt_staged(values, k, inverse)


def ntt_host_ints(vals: list[int], k: int, inverse: bool = False) -> list[int]:
    """Host ints in/out convenience wrapper (Montgomery conversion included)."""
    mont = np.stack([FR.to_mont_int(v % R) for v in vals])
    out = ntt(jnp.asarray(mont), k, inverse)
    return [FR.from_mont_limbs(row) for row in np.asarray(out)]
