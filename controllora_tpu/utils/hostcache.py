"""Host-fingerprinted persistent-compile-cache paths.

The XLA persistent compilation cache stores AOT-compiled CPU executables whose
machine-feature set is pinned at compile time. XLA loads a cache entry compiled on a
DIFFERENT host with only a stderr warning ("could lead to execution errors such as
SIGILL") — observed in this project when a container was rescheduled onto a host
without `prefer-no-scatter/gather` support while `tests/.jax_cache` carried entries
from the previous host. Wrong-ISA executables can crash or silently corrupt results,
so every persistent cache path in this repo (tests/conftest.py, bench.py,
__graft_entry__.py) is suffixed with a fingerprint of the host's CPU feature flags:
a new host simply sees a cold cache instead of foreign executables.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable id for (machine ISA, CPU feature flags)."""
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm naming
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def fingerprinted(base_dir: str) -> str:
    """`<base_dir>-<host_fingerprint>` — a per-ISA cache directory."""
    return f"{base_dir.rstrip(os.sep)}-{host_fingerprint()}"
