import os
import sys

# Multi-device CPU substitute for TPU slices (SURVEY.md §4): tests validate sharding on a
# virtual 8-device CPU mesh. XLA_FLAGS must be set before the first backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU-tunnel sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, freezing the platform config before this file runs — override it
# through the config API so tests always run on the local 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
