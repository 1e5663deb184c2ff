"""Repro/bisect for the round-4 off-curve bug: Pallas MSM at k=21 commit
shapes (grid (nb=256, trips=16) vs the green 2^16 smoke's (16, 128)).

Legs (argv[1]):
  grid   — n=2^16 points but a FORCED split plan of 1024 rows, so the kernel
           grid matches the failing commit shape (rb=262144, trips 16) while
           the host oracle stays cheap. Isolates "kernel grid shape" from
           "table size n".
  n21    — n=2^21, uniform scalars AND commit-like skewed scalars (fixed
           columns: mostly 0/1 with a few arbitrary values). Oracle = native
           host Pippenger (~20 s each). A/B accum='pallas' vs accum='pre':
           the split plan + combine are SHARED, so pre-fail => plan bug,
           pallas-only-fail => kernel bug.
  sweep  — bisect (rows, trips) on the n=2^16 table: rows in {64, 256, 1024}
           x trips in {16, 32, 128} (trips forced via H2T_MSM_BUDGET_LOG2).

Run on the real chip. Every leg prints PASS/FAIL lines; exit 1 on any FAIL.
"""

import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import curve_rr as cv
from halo2_snark_aggregator_tpu.ops import field as fo
from halo2_snark_aggregator_tpu.ops import field_rr as frr
from halo2_snark_aggregator_tpu.ops import msm as msm_mod

FAILS = []


def check(label, got, want):
    ok = got == want
    print(f"{'PASS' if ok else 'FAIL'} {label}: got={got if not ok else 'ok'}"
          f"{'' if ok else f' want={want}'}", flush=True)
    if not ok:
        FAILS.append(label)
    return ok


def make_points(n, seed=7):
    """n pseudo-random curve points as a device RR table + host ints.
    Derived by hashing indices into scalars for g1_mul on a few base points
    (full per-point g1_mul at 2^21 would take minutes: reuse 64 bases,
    point i = (i mod 64)'th base scaled by a per-i scalar is still too slow;
    instead use base * (s0 + i) incrementally: P_{i+1} = P_i + base)."""
    rng = random.Random(seed)
    base = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
    step = ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R))
    pts = []
    cur = base
    for _ in range(n):
        pts.append(cur)
        cur = ff.g1_add(cur, step)
    jpts = tuple(frr.with_bound(c, msm_mod.CARRY_BOUND)
                 for c in cv.from_affine_ints(pts))
    return pts, jpts


def scalars_uniform(n, seed=11):
    rng = random.Random(seed)
    return [rng.randrange(ff.R) for _ in range(n)]


def scalars_commitlike(n, seed=13):
    """Fixed-column shape: ~55% zeros, ~40% ones, a sprinkle of small and
    arbitrary values — the skew that drove rows_cap target-doubling in the
    k=21 keygen commits."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.55:
            out.append(0)
        elif r < 0.95:
            out.append(1)
        elif r < 0.99:
            out.append(rng.randrange(1 << 17))
        else:
            out.append(rng.randrange(ff.R))
    return out


def run_case(label, jpts, pts, scal, *, accum, target=None, budget=None,
             signed=None):
    sn = np.asarray(fo.ints_to_limbs(scal))
    old = os.environ.pop("H2T_MSM_BUDGET_LOG2", None)
    if budget is not None:
        os.environ["H2T_MSM_BUDGET_LOG2"] = str(budget)
    t0 = time.time()
    try:
        got = msm_mod.msm_staged_split(jpts, sn, c=8, accum=accum,
                                       target=target, signed=signed)
    finally:
        os.environ.pop("H2T_MSM_BUDGET_LOG2", None)
        if old is not None:
            os.environ["H2T_MSM_BUDGET_LOG2"] = old
    dt = time.time() - t0
    want = ff.g1_msm(pts, scal)
    print(f"  [{label}] {dt:.1f}s", file=sys.stderr, flush=True)
    return check(label, got, want)


def leg_grid():
    n = 1 << 16
    pts, jpts = make_points(n)
    scal = scalars_uniform(n)
    # target=16 at uniform digits: ~18 rows/window * 32 windows -> pow2 1024
    # rows; rb = 262144 -> nb = 256 blocks, trips cap = budget29/(rb*128)=16.
    # Matches the failing commit grid exactly.
    run_case("grid rows1024 trips16 pallas", jpts, pts, scal,
             accum="pallas", target=16)
    run_case("grid rows1024 trips16 pre", jpts, pts, scal,
             accum="pre", target=16)


def leg_sweep():
    n = 1 << 16
    pts, jpts = make_points(n)
    scal = scalars_uniform(n)
    # rows is steered by target (uniform maxc ~ 280): 64 rows needs
    # target>=~140 (2 rows/window), 256 rows target~36, 1024 rows target=16.
    for rows_label, target in (("64", 150), ("256", 36), ("1024", 16)):
        for trips_budget in (None, 24, 25, 27):
            tag = f"sweep rows{rows_label} budget{trips_budget}"
            run_case(tag, jpts, pts, scal, accum="pallas", target=target,
                     budget=trips_budget)


def leg_n21():
    n = 1 << 21
    t0 = time.time()
    pts, jpts = make_points(n)
    print(f"  table built in {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)
    # P_i = base + i*step, so sum s_i P_i = (sum s_i) base + (sum i s_i) step
    # — an oracle independent of the native host Pippenger, which is itself
    # the mitigation path under test at this scale.
    rng = random.Random(7)
    base_s = rng.randrange(1, ff.R)
    step_s = rng.randrange(1, ff.R)
    base = ff.g1_mul(ff.G1_GEN, base_s)
    step = ff.g1_mul(ff.G1_GEN, step_s)
    for name, scal in (("skew", scalars_commitlike(n)),
                       ("uniform", scalars_uniform(n))):
        s_tot = sum(scal) % ff.R
        si_tot = sum(i * s for i, s in enumerate(scal)) % ff.R
        analytic = ff.g1_add(ff.g1_mul(base, s_tot), ff.g1_mul(step, si_tot))
        t0 = time.time()
        native = ff.g1_msm(pts, scal)
        print(f"  [native {name}] {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        check(f"n21 {name} native-host-pippenger", native, analytic)
        run_case(f"n21 {name} pallas", jpts, pts, scal, accum="pallas")
        run_case(f"n21 {name} pre", jpts, pts, scal, accum="pre")


def leg_srs():
    """Commit-path end-to-end: a random Montgomery coefficient vector
    committed through AccelParams.commit_coeff_mont with the DEVICE path
    (pallas and pre) against the host Pippenger — over the real (migrated,
    affine) SRS cache. This is the exact round-4 poisoned path."""
    import jax.numpy as jnp

    from halo2_snark_aggregator_tpu.prover.accel import ints_to_mont
    from halo2_snark_aggregator_tpu.prover.srs import setup_cached_accel

    k = int(os.environ.get("SRS_K", "16"))
    aparams = setup_cached_accel(k)
    rng = random.Random(23)
    coeffs = [rng.randrange(ff.R) for _ in range(1 << k)]
    cm = ints_to_mont(coeffs)
    want = ff.g1_msm(aparams.g_host_points(), coeffs)
    for accum in ("pallas", "pre"):
        os.environ["H2T_COMMIT_HOST_MAX_K"] = "0"  # force device commits
        os.environ["H2T_MSM_ACCUM"] = accum
        try:
            t0 = time.time()
            got = aparams.commit_coeff_mont(jnp.asarray(cm))
            print(f"  [srs k={k} {accum}] {time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
        finally:
            os.environ.pop("H2T_COMMIT_HOST_MAX_K", None)
            os.environ.pop("H2T_MSM_ACCUM", None)
        check(f"srs k={k} device commit {accum}", got, want)


if __name__ == "__main__":
    leg = sys.argv[1] if len(sys.argv) > 1 else "grid"
    print("platform:", jax.devices()[0], file=sys.stderr)
    {"grid": leg_grid, "sweep": leg_sweep, "n21": leg_n21,
     "srs": leg_srs}[leg]()
    if FAILS:
        print("FAILURES:", FAILS, flush=True)
        sys.exit(1)
    print("ALL PASS", flush=True)
