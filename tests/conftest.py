"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

Sharding tests use a virtual 8-device CPU mesh (the driver validates real
multi-chip execution separately via __graft_entry__.dryrun_multichip).
Numerics tests use float64 to compare against analytic/golden values; the
production TPU path runs float32 (covered by dedicated f32 tolerance tests).

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin in
every Python process and forces jax_platforms="axon,cpu"; jax.config.update
below (after import, before any backend use) overrides it so tests stay local.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
