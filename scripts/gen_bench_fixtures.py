"""Generate (and persist) the headline bench's zkevm-shape proof fixtures.

Runs bench._cached_zkevm_proofs on the real chip so that the repo-committed
`bench_fixtures/` layer exists before the driver's bench window opens (the
round-2 and round-3 driver headline runs both died re-proving cold — see
VERDICT round 3 "missing" #1). Prints per-proof timings to stderr.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

k = int(os.environ.get("ZKEVM_K", "16"))
n = int(os.environ.get("ZKEVM_NPROOFS", "4"))

import bench  # noqa: E402

bench._configure_jax()
t0 = time.time()
params, vk, proofs = bench._cached_zkevm_proofs(k, n)
print(f"FIXTURES DONE: {len(proofs)} proofs K={k} in {time.time() - t0:.1f}s",
      flush=True)
