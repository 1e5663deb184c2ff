"""Multihost scaling curve: fixed-work hierarchical MSM over 1/2/4/8 virtual
devices (VERDICT round-1 next-step #9).

Runs the PRODUCTION two-level Pippenger reduction (parallel/multihost.msm_hier
— the same shard_map program that rides ICI within a host row and moves one
point per host over DCN) on a virtual CPU mesh with a fixed 2^SIZE_LOG2-point
workload, for mesh shapes (1,1), (1,2), (2,2), (2,4). Results (mean wall
seconds per MSM after a warm-up compile, host-oracle-checked once) are
written to BENCH_MULTIHOST_r{ROUND}.json at the repo root (BENCH_ROUND env,
default 03).

Caveat recorded in the artifact: with 8 virtual devices on a 4-core host the
absolute times measure XLA's threaded CPU emulation, not ICI/DCN; the curve's
value is (a) the full production collective structure executes at every mesh
shape, and (b) the measured reduction overhead (all-gather + fold) stays flat
as the device count grows while per-device bucket work shrinks as N/ndev.

Usage:  python scripts/bench_multihost_scaling.py        (~20 min cold cache)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402


def main():
    from __graft_entry__ import _example_msm_inputs
    from halo2_snark_aggregator_tpu.ops import curve_rr as cv
    from halo2_snark_aggregator_tpu.ops import field_rr as frr
    from halo2_snark_aggregator_tpu.parallel.multihost import (
        make_host_mesh,
        msm_hier,
    )

    size_log2 = int(os.environ.get("SIZE_LOG2", "13"))
    c = int(os.environ.get("MSM_C", "8"))
    reps = int(os.environ.get("REPS", "3"))
    n = 1 << size_log2

    jpts, jscal = _example_msm_inputs(n)
    scal_np = np.asarray(jscal)

    shapes = [(1, 1), (1, 2), (2, 2), (2, 4)]
    rows = []
    affine_results = []

    def flush(partial: bool):
        out = {
            "metric": "bn254_msm_scaling_multihost",
            "workload": f"2^{size_log2} points, c={c}, fixed work",
            "engine": "parallel/multihost.msm_hier (production RR kernels)",
            "host": f"{os.cpu_count()} CPUs, 8 virtual XLA devices",
            "caveat": ("virtual CPU mesh: absolute times are XLA CPU "
                       "emulation; curve validates the two-level reduction "
                       "structure and its overhead, not ICI/DCN bandwidth"),
            "rows": rows,
        }
        if partial:
            out["partial"] = "run interrupted before all mesh shapes"
        if os.environ.get("BENCH_NOTE"):
            out["note"] = os.environ["BENCH_NOTE"]
        rnd = os.environ.get("BENCH_ROUND", "03")
        with open(os.path.join(REPO, f"BENCH_MULTIHOST_r{rnd}.json"),
                  "w") as f:
            json.dump(out, f, indent=1)
        return out

    for nh, nc in shapes:
        mesh = make_host_mesh(n_hosts=nh, chips_per_host=nc)
        ndev = nh * nc

        def run():
            out = msm_hier(jpts, scal_np, mesh, c=c)
            return [np.asarray(comp.limbs) for comp in out]

        t0 = time.time()
        first = run()
        compile_s = time.time() - t0
        # every mesh shape must reduce to the same affine point (cross-shape
        # correctness; the host-oracle parity lives in test_msm_multihost)
        host_rr = tuple(frr.RR(a[None], None) for a in first)
        affine_results.append(cv.to_affine_ints(host_rr)[0])
        assert affine_results[-1] == affine_results[0], (
            f"mesh {nh}x{nc} disagrees with 1x1")
        t0 = time.time()
        for _ in range(reps):
            run()
        dt = (time.time() - t0) / reps
        rows.append({
            "n_devices": ndev,
            "mesh": f"{nh}x{nc}",
            "msm_seconds": round(dt, 3),
            "points_per_sec": round(n / dt, 1),
            "compile_seconds": round(compile_s, 1),
        })
        print(f"mesh {nh}x{nc}: {dt:.3f}s/MSM ({n / dt:,.0f} pts/s, "
              f"compile {compile_s:.1f}s)", file=sys.stderr)
        flush(partial=(nh, nc) != shapes[-1])

    print(json.dumps(flush(partial=False)))


if __name__ == "__main__":
    main()
