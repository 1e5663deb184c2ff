"""Compile-lean Pippenger MSM on the wave-batched canonical engine.

Same bucket structure as ops/msm.py (host bucket plan -> while_loop bucket
accumulate -> two-accumulator bucket reduce), but the point arithmetic is
ops/curve_lite.py: RCB complete projective formulas whose field ops are
wave-batched stacked calls over the canonical scan-based limbs, so the whole
device program holds exactly THREE point-add instances (~4s XLA CPU compile
each) instead of the RR path's multi-minute modules (MULTICHIP_r01 rc=124).
Window combination happens on the host (a few hundred bigint doublings) —
no doubling program is ever compiled.

Intended for CPU-mesh *sharding validation* (the driver's multi-chip dryrun
and the virtual-mesh tests), where XLA compile time on a few-core host
dominates and runtime is tiny. Production MSMs on real TPU hardware use
ops/msm.py — the scan carries that make this cheap to compile are exactly
what is ~1000x slower to *run* at scale on the VPU.

Differentially tested against ff/bn254.py in tests/test_msm_sharded.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import bn254 as ff
from . import curve_lite as cvl
from .msm import host_bucket_plan  # same plan layout as the RR path

__all__ = ["host_bucket_plan", "msm_windows_lite", "combine_windows_host_lite"]


def _bucket_accumulate(points, order, starts, counts):
    n = points[0].shape[0]
    windows, nbuckets = starts.shape
    acc = cvl.identity_like(points[0], (windows, nbuckets))
    max_load = jnp.max(counts)

    def cond(state):
        t, _ = state
        return t < max_load

    def body(state):
        t, acc = state
        idx_sorted = jnp.clip(starts + t, 0, n - 1)  # (W, B)
        point_idx = jnp.take_along_axis(order, idx_sorted, axis=1)
        pt = cvl.gather_point(points, point_idx)
        new = cvl.add(acc, pt)
        return t + 1, cvl.select_point(t < counts, new, acc)

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc


def _bucket_reduce(acc, c: int):
    nbuckets = 1 << c
    windows = acc[0].shape[0]

    def red_body(i, state):
        running, total = state
        b = nbuckets - 1 - i
        bucket = tuple(a[:, b] for a in acc)
        running = cvl.add(running, bucket)
        total = cvl.add(total, running)
        return running, total

    state = (cvl.identity_like(acc[0], (windows,)),
             cvl.identity_like(acc[0], (windows,)))
    _running, total = jax.lax.fori_loop(0, nbuckets - 1, red_body, state)
    return total


@functools.partial(jax.jit, static_argnames=("c",))
def msm_windows_lite(points, order, starts, counts, c: int = 4):
    """Per-window MSM totals with a host-computed bucket plan.

    points: (x, y, z) projective triple, uint32[N, 16] Montgomery limbs
    (curve_lite.from_affine_ints); (order, starts, counts) from
    host_bucket_plan. Returns the (W,) projective window totals; finish
    with combine_windows_host_lite."""
    acc = _bucket_accumulate(points, order, starts, counts)
    return _bucket_reduce(acc, c)


def combine_windows_host_lite(totals, c: int):
    """Host finish: (W,) device window totals -> affine int point (or None).
    ~W*c bigint doublings."""
    pts = cvl.to_affine_ints(totals)
    res = None
    for w in range(len(pts) - 1, -1, -1):
        if res is not None:
            for _ in range(c):
                res = ff.g1_double(res)
        res = ff.g1_add(res, pts[w]) if res is not None else pts[w]
    return res


def msm_lite_host(points_int, scalars_np: np.ndarray, c: int = 4):
    """Single-device convenience: host ints + uint32[N, 16] scalar limbs ->
    affine int point (or None)."""
    pts = cvl.from_affine_ints(points_int)
    order, starts, counts = host_bucket_plan(scalars_np, c)
    totals = msm_windows_lite(pts, jnp.asarray(order), jnp.asarray(starts),
                              jnp.asarray(counts), c=c)
    return combine_windows_host_lite(totals, c)
