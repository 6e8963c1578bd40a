"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding code paths
(jax.sharding.Mesh / shard_map) are exercised without TPU hardware, and with x64
enabled so reference-fidelity checks can run at double precision.

Note: this environment's sitecustomize imports jax at interpreter start and pins
``jax_platforms=axon,cpu`` (the TPU tunnel). Overriding the env var is therefore
ineffective — we must update jax.config after import, before any backend is used.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
