"""Hybrid TPU value context: exact host scalar protocol math + device MSM.

The verifier's wall-clock is dominated by the multiopen MSM
(SURVEY §3.1: `EvaluationQuerySchema::eval -> pchip.multi_exp [HOT: MSM]`).
This context keeps the O(thousands) transcript/query field ops on the host
(they are microseconds in exact integers) and dispatches every `multi_exp`
and the instance-commitment MSM to the Pippenger kernel on the accelerator —
single-chip (ops/msm.py) or sharded over a mesh (parallel/msm_shard.py).

The fully-traced batched context (all scalar math on device, proofs as a
batch axis) lands in arith/jnp_chip.py in a later round.
"""

from __future__ import annotations

from ..ff import bn254 as ff
from ..ops import msm as msm_mod
from .value import ValueContext, ValueEccChip


class TpuEccChip(ValueEccChip):
    """Size-aware MSM dispatch: device Pippenger for large MSMs (where the
    MXU pays for the tunnel round-trip), native host MSM below the threshold.
    Measured on v5e/axon: a few-hundred-point MSM costs ~90ms in device
    dispatch+materialization vs ~5ms on the native host path; the crossover
    sits around 2^13 points. Override with `device_min` or H2T_MSM_DEVICE_MIN.
    """

    def __init__(self, mesh=None, c: int = 8, min_msm_size: int = 8,
                 device_min: int | None = None):
        super().__init__()
        self.mesh = mesh
        self.c = c
        self.min_msm_size = min_msm_size
        if device_min is None:
            import os

            device_min = int(os.environ.get("H2T_MSM_DEVICE_MIN", "8192"))
        self.device_min = device_min

    def multi_exp(self, ctx, points, scalars, names=None):
        ctx.msm_sizes.append(len(points))
        if names:
            ctx.point_list.extend(names)
        from .. import native

        use_device = len(points) >= (
            self.min_msm_size if not native.available() else self.device_min
        )
        if not use_device:
            return ff.g1_msm(points, scalars)
        if self.mesh is not None:
            from ..parallel.msm_shard import msm_sharded_host

            return msm_sharded_host(points, scalars, self.mesh, c=self.c)
        return msm_mod.msm_host(points, scalars, c=self.c)


def make_tpu_chips(mesh=None, c: int = 8):
    """Returns (ctx, nchip, schip, pchip) wired for hybrid TPU verification."""
    ctx = ValueContext()
    pchip = TpuEccChip(mesh=mesh, c=c)
    return ctx, pchip.scalar_chip, pchip.scalar_chip, pchip
