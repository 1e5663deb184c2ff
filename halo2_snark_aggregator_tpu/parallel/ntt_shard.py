"""Mesh-sharded NTT: four-step (Bailey) decomposition with one all-to-all.

The TPU-native realization of SURVEY §2.6's "radix-2 NTT with butterfly
stages exchanged across a pod slice": instead of exchanging per butterfly
stage (log n collectives), the size-n transform is decomposed as n = n1*n2,

    X[k1 + n1*k2] = NTT2_{i2->k2}( w^{i2*k1} * NTT1_{i1->k1}(x[i1*n2 + i2]) )

so the communication collapses to ONE `lax.all_to_all` transpose between two
phases of purely local batched NTTs (ops/ntt.py vmapped over rows):

  phase 1: rows i2 sharded over the mesh axis; local size-n1 NTTs + the
           w^{i2*k1} twiddle (table sharded identically, so no gathers);
  all-to-all: re-shard from i2-rows to k1-rows (ICI);
  phase 2: local size-n2 NTTs along i2.

The result is returned k1-sharded as a (n1, n2, 16) matrix with
X[k1 + n1*k2] = R[k1, k2]; `ntt_sharded_to_host` reassembles the in-order
vector for verification. Works unchanged over a DCN-spanning axis (the
all-to-all is the only cross-host traffic, n*16*4 bytes total).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ff.bn254 import R
from ..ops import field as fo
from ..ops.ntt import ntt
from ..prover.domain import omega_for_k

FR = fo.FR


@functools.lru_cache(maxsize=16)
def _twiddle_table(k1: int, k2: int, inverse: bool) -> np.ndarray:
    """(n2, n1) Montgomery table of w^(i2*k1) for the middle twiddle."""
    n1, n2 = 1 << k1, 1 << k2
    w = omega_for_k(k1 + k2)
    if inverse:
        w = pow(w, -1, R)
    out = np.zeros((n2, n1, fo.LIMBS), dtype=np.uint32)
    for i2 in range(n2):
        t = pow(w, i2, R)
        cur = 1
        for j in range(n1):
            out[i2, j] = FR.to_mont_int(cur)
            cur = cur * t % R
    return out


def ntt_sharded(values, k1: int, k2: int, mesh: Mesh, axis: str = "shard",
                inverse: bool = False):
    """values: uint32[n, 16] Montgomery (host or device), n = 2^(k1+k2).
    Returns the k1-sharded (n1, n2, 16) result matrix R with
    X[k1 + n1*k2] = R[k1, k2] (for inverse: includes the 1/n scale)."""
    n1, n2 = 1 << k1, 1 << k2
    ndev = mesh.shape[axis]
    assert n2 % ndev == 0 and n1 % ndev == 0
    x = jnp.asarray(values).reshape(n1, n2, fo.LIMBS)
    # B[i2, i1] = x[i1*n2 + i2]
    b = jnp.transpose(x, (1, 0, 2))
    tw = jnp.asarray(_twiddle_table(k1, k2, inverse))

    local_ntt1 = jax.vmap(lambda v: ntt(v, k1, inverse=False))
    local_ntt2 = jax.vmap(lambda v: ntt(v, k2, inverse=False))

    if inverse:
        wrap1 = jax.vmap(lambda v: ntt(v, k1, inverse=True))
        wrap2 = jax.vmap(lambda v: ntt(v, k2, inverse=True))
    else:
        wrap1, wrap2 = local_ntt1, local_ntt2

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(b_local, tw_local):
        # phase 1: size-n1 NTT along i1 for each local row i2, then twiddle
        s1 = wrap1(b_local)                       # (n2/ndev, n1, 16)
        s1 = fo.mont_mul(FR, s1, tw_local)
        # transpose shards: split k1, concat i2 (the only collective)
        t = jax.lax.all_to_all(s1, axis, split_axis=1, concat_axis=0,
                               tiled=True)        # (n2, n1/ndev, 16)
        t = jnp.transpose(t, (1, 0, 2))           # (n1/ndev, n2, 16)
        # phase 2: size-n2 NTT along i2 for each local row k1
        return wrap2(t)

    return run(b, tw)


def ntt_sharded_to_host(r) -> np.ndarray:
    """(n1, n2, 16) result matrix -> in-order uint32[n, 16] on host."""
    r = np.asarray(r)
    n1, n2, _ = r.shape
    return np.transpose(r, (1, 0, 2)).reshape(n1 * n2, fo.LIMBS)
