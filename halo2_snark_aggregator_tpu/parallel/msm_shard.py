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


def msm_sharded(points, scalars, mesh: Mesh, c: int = 8, axis: str = "shard"):
    """points: Jacobian triple uint32[N, 16]; scalars: uint32[N, 16].
    N must be divisible by the mesh axis size (pad with identity upstream)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            (P(axis), P(axis), P(axis)),
            P(axis),
        ),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    def _sharded(pts, scals):
        local = msm_mod.msm(pts, scals, c=c)
        return tuple(frr.RR(comp.limbs[None], comp.bound) for comp in local)

    partials = _sharded(points, scalars)  # leaves (ndev, 32) per component
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
    jscal = jnp.asarray(fo.ints_to_limbs(scals))
    out = msm_sharded(jpts, jscal, mesh, c=c, axis=axis)
    host = tuple(frr.RR(np.asarray(comp.limbs)[None], comp.bound) for comp in out)
    return cv.to_affine_ints(host)[0]
