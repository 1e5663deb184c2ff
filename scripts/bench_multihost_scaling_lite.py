"""Multihost scaling curve, compile-lean engine (ops/msm_lite): fixed-work
hierarchical MSM over 1/2/4/8 virtual devices.

The production-engine variant (bench_multihost_scaling.py) measured its 1x1
anchor at 2545 s/MSM with a 45-minute XLA:CPU compile PER MESH SHAPE on this
4-CPU box — the full 4-shape curve cannot complete in a round (this is the
third round it has tried). This run keeps that recorded production anchor and
completes the CURVE with msm_hier_lite: the same shard_map program structure
(per-device window bucket work, host-axis hierarchical fold, one point per
host over the DCN analog), wave-batched canonical arithmetic instead of the
RR limb kernels. The curve's claim is the scaling SHAPE of the collective
structure, not absolute kernel speed (that is measured on the real chip in
BENCH_MSM_r0x.json).

Appends rows_lite to BENCH_MULTIHOST_r{ROUND}.json, preserving existing rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402


def main():
    import random

    from jax.sharding import Mesh
    from halo2_snark_aggregator_tpu.ff import bn254 as ff
    from halo2_snark_aggregator_tpu.ops import curve_lite as cvl
    from halo2_snark_aggregator_tpu.ops import field as fo
    from halo2_snark_aggregator_tpu.parallel import multihost as mh

    round_tag = os.environ.get("BENCH_ROUND", "04")
    path = os.path.join(REPO, f"BENCH_MULTIHOST_r{round_tag}.json")
    size_log2 = int(os.environ.get("SIZE_LOG2", "13"))
    c = int(os.environ.get("MSM_C", "4"))
    reps = int(os.environ.get("REPS", "3"))
    n = 1 << size_log2

    rng = random.Random(11)
    base = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(32)]
    pts = [base[i % 32] for i in range(n)]
    scal = [rng.randrange(ff.R) for _ in range(n)]
    jpts = cvl.from_affine_ints(pts)
    scal_np = fo.ints_to_limbs(scal)
    expected = ff.g1_msm(pts, scal)

    doc = {
        "metric": "bn254_msm_scaling_multihost",
        "workload": f"2^{size_log2} points, fixed work",
        "host": "4 CPUs, 8 virtual XLA devices",
        "rows": [],
    }
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["engine_lite"] = (
        f"parallel/multihost.msm_hier_lite c={c} (wave-batched canonical "
        "engine; same shard_map/collective structure as msm_hier)")
    doc["rows_lite"] = []
    doc.pop("partial", None)
    doc["note_lite"] = (
        "production-engine curve infeasible on this box (45 min XLA:CPU "
        "compile per mesh shape; 1x1 anchor kept in rows); rows_lite "
        "completes the scaling curve with the compile-lean engine")

    devs = jax.devices()
    for nh, nc in ((1, 1), (1, 2), (2, 2), (2, 4)):
        nd = nh * nc
        mesh = Mesh(np.array(devs[:nd]).reshape(nh, nc),
                    (mh.HOST_AXIS, mh.CHIP_AXIS))
        t0 = time.time()
        got = mh.msm_hier_lite(jpts, scal_np, mesh, c=c)
        compile_s = time.time() - t0
        assert got == expected, f"mesh {nh}x{nc} mismatch"
        t0 = time.time()
        for _ in range(reps):
            got = mh.msm_hier_lite(jpts, scal_np, mesh, c=c)
        dt = (time.time() - t0) / reps
        assert got == expected
        row = {"n_devices": nd, "mesh": f"{nh}x{nc}",
               "msm_seconds": round(dt, 3),
               "points_per_sec": round(n / dt, 1),
               "compile_seconds": round(compile_s, 1)}
        doc["rows_lite"].append(row)
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"mesh {nh}x{nc}: {dt:.3f}s/MSM ({n/dt:.0f} pts/s, "
              f"first {compile_s:.1f}s) [flushed]", file=sys.stderr)


if __name__ == "__main__":
    main()
