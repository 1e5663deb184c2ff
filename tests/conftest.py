"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; tests must be hermetic and
exercise multi-chip sharding logic without hardware (see task spec).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
