"""Real-TPU smoke test for the fused Pallas MSM accumulate: small MSM,
oracle-checked, then a 2^16 timing probe. Run on the axon backend."""

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

print("platform:", jax.devices()[0], file=sys.stderr)

# --- correctness: small MSM, c=8 (production window) ---
rng = random.Random(7)
n = 256
pts = [ff.g1_mul(ff.G1_GEN, rng.randrange(1, ff.R)) for _ in range(n)]
jpts = tuple(frr.with_bound(c, msm_mod.CARRY_BOUND)
             for c in cv.from_affine_ints(pts))
scal = [rng.randrange(ff.R) for _ in range(n)]
sn = fo.ints_to_limbs(scal)
t0 = time.time()
got = msm_mod.msm_staged_split(jpts, sn, c=8, accum="pallas")
print(f"small msm (compile+run): {time.time()-t0:.1f}s", file=sys.stderr)
want = ff.g1_msm(pts, scal)
assert got == want, "MISMATCH on small MSM"
print("small MSM matches oracle", file=sys.stderr)

t0 = time.time()
got_s = msm_mod.msm_staged_split(jpts, sn, c=8, accum="pallas", signed=True)
print(f"small signed msm (compile+run): {time.time()-t0:.1f}s",
      file=sys.stderr)
assert got_s == want, "MISMATCH on small SIGNED MSM"
print("small signed MSM matches oracle", file=sys.stderr)

# --- timing probe: 2^16 ---
from __graft_entry__ import _example_msm_inputs

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
jpts, jscal = _example_msm_inputs(n)
scal_np = np.asarray(jscal)
t0 = time.time()
res = msm_mod.msm_staged_split(jpts, scal_np, c=8, accum="pallas")
print(f"2^{n.bit_length()-1} first run (compile+run): {time.time()-t0:.1f}s",
      file=sys.stderr)
reps = 3
t0 = time.time()
for _ in range(reps):
    res = msm_mod.msm_staged_split(jpts, scal_np, c=8, accum="pallas")
dt = (time.time() - t0) / reps
print(f"2^{n.bit_length()-1} pallas MSM: {dt*1000:.1f} ms = "
      f"{n/dt:.0f} pts/s", file=sys.stderr)
