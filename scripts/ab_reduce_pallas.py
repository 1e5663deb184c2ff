"""One-process A/B: Pallas serial bucket reduce vs XLA log-depth reduce,
plus full-MSM timings for both, on the real chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from halo2_snark_aggregator_tpu.ff import bn254 as ff
from halo2_snark_aggregator_tpu.ops import msm as msm_mod
from halo2_snark_aggregator_tpu.ops import msm_pallas as mp
from __graft_entry__ import _example_msm_inputs

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
c = 8
jpts, jscal = _example_msm_inputs(n)
scal_np = np.asarray(jscal)

order_np, starts_np, counts_np, weights = msm_mod.host_bucket_plan_split(
    scal_np, c, None)
rows, nbuckets = counts_np.shape
rb = rows * nbuckets
budget = 1 << 29
load_cap = 1 << max(0, int(counts_np.max()) - 1).bit_length()
cap = max(1, min(512, load_cap, budget // (rb * 2 * 16 * 4)))
cap = 1 << (cap.bit_length() - 1)
print(f"rows={rows} cap={cap} max_load={counts_np.max()}", file=sys.stderr)

expect = None

def time_it(name, fn, reps=3):
    global expect
    out = fn()  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms", file=sys.stderr)
    return out

# A: accumulate + pallas reduce + host combine
def run_a():
    totals = mp.msm_totals_pallas(jpts, order_np, starts_np, counts_np,
                                  weights, trips_cap=cap)
    return msm_mod.combine_rows_host(totals, weights, c)

# B: accumulate + XLA logdepth reduce + host combine
def run_b():
    acc = mp.msm_accumulate_pallas(jpts, order_np, starts_np, counts_np,
                                   weights, trips_cap=cap)
    totals = msm_mod.bucket_reduce_logdepth(acc, c=c)
    return msm_mod.combine_rows_host(totals, weights, c)

ra = time_it("A full (pallas reduce)", run_a)
rb_ = time_it("B full (xla reduce)", run_b)
assert ra == rb_, "reduce paths disagree!"
print("results agree", file=sys.stderr)

# phase-only timings (acc fixed)
acc_t, rb_pad = mp._accumulate_tiled(jpts, order_np, starts_np, counts_np,
                                     weights, cap, False)
np.asarray(acc_t[0])

def phase_pallas():
    nbr = 1 << max(0, max(1, -(-rows // mp.BLOCK)) - 1).bit_length()
    r_pad = nbr * mp.BLOCK
    blocks = []
    for comp in acc_t:
        v = mp._untile_value(comp, rb_pad)[:, :rb].reshape(16, rows, nbuckets)
        v = jnp.moveaxis(v, 2, 0)
        v = mp._pad_rb(v, r_pad)
        blocks.append(mp._tile_value(v).reshape(-1, mp.LANE))
    t3 = mp.reduce_buckets_pallas(*blocks, nbuckets=nbuckets,
                                  interpret=False)
    return np.asarray(t3[0])

def phase_xla():
    acc = tuple(mp._untile_value(compo, rb_pad)[:, :rb] for compo in acc_t)
    rr = mp.rr_from_acc(acc, (rows, nbuckets))
    t = msm_mod.bucket_reduce_logdepth(rr, c=c)
    return np.asarray(t[0].limbs)

time_it("reduce phase pallas", phase_pallas)
time_it("reduce phase xla", phase_xla)

def accum_only():
    a, _ = mp._accumulate_tiled(jpts, order_np, starts_np, counts_np,
                                weights, cap, False)
    return np.asarray(a[0])

time_it("accumulate phase", accum_only)
