"""Multi-host (DCN-aware) parallelism: hierarchical meshes and the
two-level MSM reduction.

The reference is a single 24-thread process (SURVEY §2.6,
halo2-snark-aggregator-sdk/src/lib.rs:53-58); its scaling axis is raw CPU.
The TPU-native equivalent spans a pod slice: a 2-D mesh with a fast inner
axis ("chip", ICI within a host/slice) and a slow outer axis ("host", DCN
across hosts). Layout rule from the scaling playbook: heavy collectives ride
the inner axis; at most O(1) data per host crosses the outer axis.

For the Pippenger MSM that means:

  1. points are sharded over BOTH axes flattened — each of the
     n_hosts*chips_per_host devices runs the full bucket kernel
     (ops/msm.msm_planned) on its N/ndev chunk;
  2. the per-device partial sums (one Jacobian point each) are all-gathered
     over the *chip* axis and folded locally — ICI traffic, 3*32 int32 per
     chip;
  3. the per-host partials are all-gathered over the *host* axis and folded —
     the ONLY DCN traffic: one point (384 B) per host per MSM.

Everything stays inside one shard_map, so XLA overlaps the local bucket
work of step 1 with nothing — it dominates at N >> ndev — and the two
collectives cost microseconds.

`jax.distributed` wiring: on a real multi-host deployment call
`init_distributed()` once per process before `make_host_mesh`; the same code
then runs unchanged with the outer axis spanning DCN. Single-process (tests,
one host) it falls back to slicing the local devices into a virtual
(n_hosts, chips_per_host) grid, which is what the CPU-mesh tests exercise.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ff import bn254 as ff
from ..ops import curve_rr as cv
from ..ops import field as fo
from ..ops import field_rr as frr
from ..ops import msm as msm_mod

HOST_AXIS = "host"
CHIP_AXIS = "chip"


def init_distributed() -> bool:
    """Initialize the JAX distributed runtime from the standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID). Returns
    True when running multi-process; False (no-op) otherwise."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if not addr or nproc <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=nproc,
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    return True


def make_host_mesh(n_hosts: int | None = None,
                   chips_per_host: int | None = None) -> Mesh:
    """(host, chip) mesh. Multi-process: device-to-host assignment follows
    jax.devices() order (grouped by process), so the outer axis crosses DCN.
    Single-process: a virtual grid over the local devices."""
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(1, jax.process_count())
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    devs = devs[: n_hosts * chips_per_host]
    grid = np.array(devs).reshape(n_hosts, chips_per_host)
    return Mesh(grid, (HOST_AXIS, CHIP_AXIS))


def msm_hier(points, scalars_np: np.ndarray, mesh: Mesh, c: int = 8):
    """points: projective RR triple, limbs int32[N, 32] (flat-sharded over
    both axes); scalars_np: uint32[N, 16] HOST numpy. N must be divisible by
    n_hosts*chips_per_host (pad upstream — see msm_hier_host). Returns the
    replicated Jacobian RR sum."""
    nh, nc = mesh.shape[HOST_AXIS], mesh.shape[CHIP_AXIS]
    ndev = nh * nc
    n = scalars_np.shape[0]
    chunk = n // ndev
    plans = [
        msm_mod.host_bucket_plan(scalars_np[d * chunk : (d + 1) * chunk], c)
        for d in range(ndev)
    ]
    # device-major stacking matches the flattened (host, chip) shard order
    order = jnp.asarray(np.stack([p[0] for p in plans]))   # (ndev, W, chunk)
    starts = jnp.asarray(np.stack([p[1] for p in plans]))
    counts = jnp.asarray(np.stack([p[2] for p in plans]))

    flat = P((HOST_AXIS, CHIP_AXIS))

    def _fold(comps_gathered, width):
        """comps_gathered: 3 limb arrays with a leading gathered axis of
        static size `width`; linear complete-add fold (width is tiny: the
        mesh axis size)."""
        def at(i):
            return tuple(
                frr.RR(a[i], msm_mod.CARRY_BOUND) for a in comps_gathered
            )

        acc = at(0)
        for i in range(1, width):
            # loop-carried RR values pin a fixed bound (static pytree aux)
            acc = tuple(
                frr.with_bound(comp, msm_mod.CARRY_BOUND)
                for comp in cv.add(acc, at(i))
            )
        return acc

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=((flat, flat, flat), flat, flat, flat),
        out_specs=(P(), P(), P()),
        # outputs are truly replicated (all_gather over both axes before the
        # folds) but the conservative vma inference can't prove it through
        # the wave-batched point adds
        check_vma=False,
    )
    def _run(pts, order_l, starts_l, counts_l):
        local = msm_mod.msm_planned(
            pts, order_l[0], starts_l[0], counts_l[0], c=c
        )
        # ICI: gather the nc chip partials within this host, fold locally
        chip_g = [jax.lax.all_gather(comp.limbs, CHIP_AXIS) for comp in local]
        host_partial = _fold(chip_g, nc)
        # DCN: one point per host crosses the outer axis
        host_g = [
            jax.lax.all_gather(comp.limbs, HOST_AXIS) for comp in host_partial
        ]
        total = _fold(host_g, nh)
        return tuple(comp.limbs for comp in total)

    out = _run(points, order, starts, counts)
    return tuple(frr.RR(limbs, msm_mod.CARRY_BOUND) for limbs in out)


def msm_hier_lite(points, scalars_np: np.ndarray, mesh: Mesh, c: int = 4):
    """Compile-lean hierarchical MSM (ops/msm_lite.py engine): the same
    two-level collective structure as msm_hier — per-device bucket work,
    all_gather over the chip (ICI) axis, then all_gather over the host (DCN)
    axis — over the wave-batched canonical engine. The gathered (ndev, W)
    window totals are folded with ONE traced point-add instance (a fori_loop
    over the gathered axis) and window-combined on the host.

    For CPU-mesh dryruns/tests where compile time dominates; production uses
    msm_hier. Returns the affine int point (or None)."""
    from ..ops import curve_lite as cvl
    from ..ops import msm_lite

    nh, nc = mesh.shape[HOST_AXIS], mesh.shape[CHIP_AXIS]
    ndev = nh * nc
    n = scalars_np.shape[0]
    chunk = n // ndev
    plans = [
        msm_mod.host_bucket_plan(scalars_np[d * chunk : (d + 1) * chunk], c)
        for d in range(ndev)
    ]
    order = jnp.asarray(np.stack([p[0] for p in plans]))
    starts = jnp.asarray(np.stack([p[1] for p in plans]))
    counts = jnp.asarray(np.stack([p[2] for p in plans]))

    flat = P((HOST_AXIS, CHIP_AXIS))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=((flat, flat, flat), flat, flat, flat),
        out_specs=(P(), P(), P()),
        # outputs are truly replicated (all_gather over both axes before the
        # fold) but the conservative vma inference can't prove it
        check_vma=False,
    )
    def _run(pts, order_l, starts_l, counts_l):
        local = msm_lite.msm_windows_lite(
            pts, order_l[0], starts_l[0], counts_l[0], c=c
        )
        # ICI: gather the nc chip window-total vectors within this host
        chip_g = tuple(jax.lax.all_gather(comp, CHIP_AXIS) for comp in local)
        # DCN: gather the per-host stacks across hosts -> (nh, nc, W, 16)
        host_g = tuple(jax.lax.all_gather(comp, HOST_AXIS) for comp in chip_g)
        stacked = tuple(comp.reshape((ndev,) + comp.shape[2:]) for comp in host_g)

        def fold_body(i, acc):
            return cvl.add(acc, tuple(comp[i] for comp in stacked))

        acc = tuple(comp[0] for comp in stacked)
        return jax.lax.fori_loop(1, ndev, fold_body, acc)

    totals = _run(points, order, starts, counts)  # replicated (W, 16) triple
    return msm_lite.combine_windows_host_lite(totals, c)


def msm_hier_host(points_int, scalars_int, mesh: Mesh, c: int = 8):
    """Host affine ints in / affine int out; pads N to a multiple of the
    device count with the identity (scalar 0)."""
    nh, nc = mesh.shape[HOST_AXIS], mesh.shape[CHIP_AXIS]
    ndev = nh * nc
    n = len(points_int)
    pad = (-n) % ndev
    pts = list(points_int) + [None] * pad
    scals = [s % ff.R for s in scalars_int] + [0] * pad
    jpts = tuple(
        frr.with_bound(comp, msm_mod.CARRY_BOUND)
        for comp in cv.from_affine_ints(pts)
    )
    scal_np = fo.ints_to_limbs(scals)
    out = msm_hier(jpts, scal_np, mesh, c=c)
    host = tuple(
        frr.RR(np.asarray(comp.limbs)[None], comp.bound) for comp in out
    )
    return cv.to_affine_ints(host)[0]
