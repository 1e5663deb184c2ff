"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; tests must be hermetic and
exercise multi-chip sharding logic without hardware. NOTE: the environment
may already export JAX_PLATFORMS=axon (the tunneled TPU backend), so this
must overwrite, not setdefault.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest plugins (jaxtyping) import jax before this conftest runs, so the
# env-var default may already be latched to the axon TPU backend; force the
# config explicitly (backends are still uninitialized at plugin-load time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the limb-arithmetic kernels produce large
# XLA graphs; caching makes repeated test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
# persist every compile: the accel-prover pipeline dispatches many small
# limb-kernel shapes; on a few-core box each 0.5-2s compile adds up across
# sessions while staying under the old 2s persistence threshold
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
