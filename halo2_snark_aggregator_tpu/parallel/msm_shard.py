"""Multi-chip MSM: points sharded across a device mesh, partial sums reduced
over ICI.

The TPU-native equivalent of the reference's single-threaded multi_exp
(SURVEY §2.6: "buckets partitioned across chips, bucket sums reduced via ICI
collectives"): each device runs the full Pippenger kernel (ops/msm.py) on its
point shard; the 8-or-so partial Jacobian results are all-gathered over the
mesh axis (one tiny collective) and folded with the complete-add kernel on
every device (replicated output).

Scales to multi-host: the same shard_map over a DCN-spanning mesh axis works
unchanged; with N >> devices the collective cost (one point per device) is
negligible against the O(N/devices) bucket work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ff import bn254 as ff
from ..ops import curve_rr as cv
from ..ops import field as fo
from ..ops import field_rr as frr
from ..ops import msm as msm_mod


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def msm_sharded(points, scalars_np: np.ndarray, mesh: Mesh, c: int = 8,
                axis: str = "shard"):
    """points: projective RR triple with limbs int32[N, 32] (device);
    scalars_np: uint32[N, 16] HOST numpy (the bucket plan is host-computed
    per shard — see ops/msm.host_bucket_plan). N must be divisible by the
    mesh axis size (pad with identity upstream)."""
    ndev = mesh.shape[axis]
    n = scalars_np.shape[0]
    chunk = n // ndev
    plans = [
        msm_mod.host_bucket_plan(scalars_np[d * chunk : (d + 1) * chunk], c)
        for d in range(ndev)
    ]
    order = jnp.asarray(np.stack([p[0] for p in plans]))    # (ndev, W, chunk)
    starts = jnp.asarray(np.stack([p[1] for p in plans]))
    counts = jnp.asarray(np.stack([p[2] for p in plans]))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            (P(axis), P(axis), P(axis)),
            P(axis), P(axis), P(axis),
        ),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    def _sharded(pts, order_l, starts_l, counts_l):
        local = msm_mod.msm_planned(
            pts, order_l[0], starts_l[0], counts_l[0], c=c
        )
        return tuple(frr.RR(comp.limbs[None], comp.bound) for comp in local)

    partials = _sharded(points, order, starts, counts)  # leaves (ndev, 32)
    ndev = mesh.shape[axis]

    def at(d):
        return tuple(frr.RR(comp.limbs[d], comp.bound) for comp in partials)

    acc = at(0)
    for d in range(1, ndev):
        acc = tuple(
            frr.with_bound(comp, msm_mod.CARRY_BOUND)
            for comp in cv.add(acc, at(d))
        )
    return acc


def msm_sharded_lite(points, scalars_np: np.ndarray, mesh: Mesh, c: int = 4,
                     axis: str = "shard"):
    """Compile-lean sharded MSM (ops/msm_lite.py engine): the same shard_map
    structure as msm_sharded — per-device Pippenger bucket work on the point
    shard — over the wave-batched canonical engine; the per-device window
    totals stay points-sharded and are folded/combined on the host (bigints).
    For CPU-mesh dryruns/tests where compile time on a few-core host
    dominates (MULTICHIP_r01 rc=124); production uses msm_sharded.

    Returns the affine int point (or None)."""
    from ..ops import msm_lite

    ndev = mesh.shape[axis]
    n = scalars_np.shape[0]
    chunk = n // ndev
    plans = [
        msm_mod.host_bucket_plan(scalars_np[d * chunk : (d + 1) * chunk], c)
        for d in range(ndev)
    ]
    order = jnp.asarray(np.stack([p[0] for p in plans]))
    starts = jnp.asarray(np.stack([p[1] for p in plans]))
    counts = jnp.asarray(np.stack([p[2] for p in plans]))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=((P(axis), P(axis), P(axis)), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    def _sharded(pts, order_l, starts_l, counts_l):
        totals = msm_lite.msm_windows_lite(
            pts, order_l[0], starts_l[0], counts_l[0], c=c
        )
        return tuple(comp[None] for comp in totals)  # (1, W, 16) per shard

    partials = _sharded(points, order, starts, counts)  # leaves (ndev, W, 16)
    res = None
    for d in range(ndev):
        pd = msm_lite.combine_windows_host_lite(
            tuple(comp[d] for comp in partials), c)
        res = pd if res is None else (
            ff.g1_add(res, pd) if pd is not None else res)
    return res


def msm_sharded_lite_host(points_int, scalars_int, mesh: Mesh, c: int = 4,
                          axis: str = "shard"):
    """Host ints in/out for the lite engine; pads to the axis size."""
    from ..ops import curve_lite as cvl

    ndev = mesh.shape[axis]
    n = len(points_int)
    pad = (-n) % ndev
    pts = list(points_int) + [None] * pad
    scals = [s % ff.R for s in scalars_int] + [0] * pad
    jpts = cvl.from_affine_ints(pts)
    scal_np = fo.ints_to_limbs(scals)
    return msm_sharded_lite(jpts, scal_np, mesh, c=c, axis=axis)


def msm_sharded_host(points_int, scalars_int, mesh: Mesh, c: int = 8,
                     axis: str = "shard"):
    """Host ints in/out; pads N to a multiple of the axis size with identity."""
    ndev = mesh.shape[axis]
    n = len(points_int)
    pad = (-n) % ndev
    pts = list(points_int) + [None] * pad
    scals = [s % ff.R for s in scalars_int] + [0] * pad
    jpts = tuple(
        frr.with_bound(comp, msm_mod.CARRY_BOUND) for comp in cv.from_affine_ints(pts)
    )
    scal_np = fo.ints_to_limbs(scals)
    out = msm_sharded(jpts, scal_np, mesh, c=c, axis=axis)
    host = tuple(frr.RR(np.asarray(comp.limbs)[None], comp.bound) for comp in out)
    return cv.to_affine_ints(host)[0]
