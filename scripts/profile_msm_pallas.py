"""Phase-level profiling of the Pallas MSM path on the real chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from halo2_snark_aggregator_tpu.ops import msm as msm_mod
from halo2_snark_aggregator_tpu.ops import msm_pallas as mp
from __graft_entry__ import _example_msm_inputs

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
c = 8
jpts, jscal = _example_msm_inputs(n)
scal_np = np.asarray(jscal)

def mat(x):
    return np.asarray(x)

t0 = time.time()
order_np, starts_np, counts_np, weights = msm_mod.host_bucket_plan_split(
    scal_np, c, None)
print(f"plan: {time.time()-t0:.3f}s rows={counts_np.shape} "
      f"max_load={counts_np.max()}", file=sys.stderr)

tx, ty = mp.table_from_rr(jpts)
mat(tx)
rows, nbuckets = counts_np.shape
rb = rows * nbuckets
nb_p = (rb + mp.BLOCK - 1) // mp.BLOCK
nb_p = 1 << max(0, nb_p - 1).bit_length()  # match _accumulate_tiled pow2
rb_pad = nb_p * mp.BLOCK
from halo2_snark_aggregator_tpu.ops import field as fo
order = fo.np_to_dev(order_np)
starts = jnp.asarray(starts_np)
counts_flat = mp._pad_rb(jnp.asarray(counts_np, np.int32).reshape(1, rb), rb_pad)
row_window = jnp.asarray(weights)
max_load = int(counts_np.max())
budget = 1 << 28
load_cap = 1 << max(0, max_load - 1).bit_length()
cap = max(1, min(512, load_cap, budget // (rb * 2 * 16 * 4)))
print(f"cap={cap} dispatches={-(-max_load//cap)} rb_pad={rb_pad}",
      file=sys.stderr)

counts_flat = mp._tile_counts(counts_flat)
nb = rb_pad // mp.BLOCK


def gather(t):
    px, py = mp.pregather16(tx, ty, order, starts, jnp.int32(t), cap,
                            row_window)
    px = mp._tile_value(mp._pad_rb(px, rb_pad)).reshape(-1, mp.LANE)
    py = mp._tile_value(mp._pad_rb(py, rb_pad)).reshape(-1, mp.LANE)
    return px, py


# warm all programs
pre_x, pre_y = gather(0)
mat(pre_x)
acc0 = (jnp.zeros((nb * 128, mp.LANE), jnp.uint32),
        mp._tile_value(mp._pad_rb(jnp.broadcast_to(
            jnp.asarray(mp._mont_one16(), jnp.uint32)[:, None],
            (16, rb)), rb_pad)),
        jnp.zeros((nb * 128, mp.LANE), jnp.uint32))
acc = mp.accum_steps_pallas(pre_x, pre_y, counts_flat, acc0, jnp.int32(0), cap)
mat(acc[0])
accs = tuple(mp._untile_value(comp, rb_pad)[:, :rb] for comp in acc)
rr = mp.rr_from_acc(accs, (rows, nbuckets))
totals = msm_mod.bucket_reduce_logdepth(rr, c=c)
mat(totals[0].limbs)

# timed phases
t0 = time.time()
pre_x, pre_y = gather(0)
mat(pre_x)
print(f"pregather({cap} trips): {time.time()-t0:.3f}s", file=sys.stderr)

t0 = time.time()
acc = mp.accum_steps_pallas(pre_x, pre_y, counts_flat, acc0, jnp.int32(0), cap)
mat(acc[0])
print(f"kernel({cap} trips x {rb_pad//mp.BLOCK} blocks): "
      f"{time.time()-t0:.3f}s", file=sys.stderr)

t0 = time.time()
rr = mp.rr_from_acc(
    tuple(mp._untile_value(comp, rb_pad)[:, :rb] for comp in acc),
    (rows, nbuckets))
totals = msm_mod.bucket_reduce_logdepth(rr, c=c)
mat(totals[0].limbs)
print(f"reduce: {time.time()-t0:.3f}s", file=sys.stderr)

t0 = time.time()
res = msm_mod.combine_rows_host(totals, weights, c)
print(f"combine_host: {time.time()-t0:.3f}s", file=sys.stderr)

# Pallas serial bucket reduce (the production totals path)
tot_p = mp.msm_totals_pallas(jpts, order_np, starts_np, counts_np, weights,
                             trips_cap=cap)
mat(tot_p[0].limbs)
t0 = time.time()
tot_p = mp.msm_totals_pallas(jpts, order_np, starts_np, counts_np, weights,
                             trips_cap=cap)
mat(tot_p[0].limbs)
print(f"accum+reduce pallas (all dispatches): {time.time()-t0:.3f}s",
      file=sys.stderr)

t0 = time.time()
res = msm_mod.msm_staged_split(jpts, scal_np, c=8, accum="pallas")
print(f"full msm: {time.time()-t0:.3f}s = {n/(time.time()-t0):.0f} pts/s",
      file=sys.stderr)
