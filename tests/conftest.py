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

# Persistent XLA compilation cache: the suite is compile-dominated (the pipeline and
# training tests each jit multi-hundred-op programs on a single-core container), so the
# first run pays full compile cost and every later run replays cached executables. This
# is what keeps the full suite under the CI time budget on repeat runs.
# The directory is suffixed with a host-CPU fingerprint (utils/hostcache.py): XLA
# loads foreign-ISA AOT entries with only a warning, and a container rescheduled
# onto a different host would otherwise replay executables that can SIGILL or
# corrupt numerics.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from controllora_tpu.utils.hostcache import fingerprinted  # noqa: E402

_CACHE_DIR = fingerprinted(os.environ.get(
    "CONTROLLORA_TEST_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
))
# Set via env (not only the config API) so tests that spawn fresh-JAX subprocesses
# (test_entry, test_distributed) share the same cache.
os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
