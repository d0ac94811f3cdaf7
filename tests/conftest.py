"""Test configuration: force an 8-device virtual CPU mesh.

All sharding/pjit tests run on the host platform with 8 virtual devices so
multi-chip layouts are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

The environment pre-registers the 'axon' TPU-tunnel backend via
sitecustomize and forces jax_platforms='axon,cpu' through jax.config (which
beats env vars), so we must override through jax.config as well.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
