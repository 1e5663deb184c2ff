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


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m "not kernels"` is the fast host tier (green in
# ~2 min cold on 4 CPUs); the `kernels` tier holds every compile-heavy
# device-kernel test (large XLA modules; minutes cold, cache-backed after).
# ---------------------------------------------------------------------------

_KERNEL_TEST_FILES = {
    "test_field_rr.py",
    "test_field_pallas.py",
    "test_field_ops.py",
    "test_poseidon_rr.py",
    "test_poseidon_pallas.py",
    "test_poseidon_ops.py",
    "test_curve_msm.py",
    "test_curve_pallas.py",
    "test_msm_sharded.py",
    "test_msm_multihost.py",
    "test_ntt_ops.py",
    "test_ntt_pallas.py",
    "test_ntt_sharded.py",
    "test_accel_prover.py",
    "test_batched_verifier.py",
    "test_tape.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "kernels: compile-heavy device-kernel tests (run with -m kernels; "
        "excluded from the fast tier via -m 'not kernels')",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.fspath.basename in _KERNEL_TEST_FILES:
            item.add_marker(pytest.mark.kernels)
