"""Multi-host initialization.

The reference's multi-process story is `accelerate launch` + DDP env plumbing
(reference train:293, 318-320). TPU-native: `jax.distributed.initialize()` connects
hosts over DCN; within a host, jit drives all local chips; shardings ride ICI.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when multi-host env vars are present.

    Recognized setups: Cloud TPU metadata (auto-detected by jax), or explicit
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    Returns True when a multi-process runtime was initialized."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        return True
    # TPU pod slices auto-detect through the runtime; initialize() is a no-op
    # elsewhere but raises on CPU-only setups — guard it.
    if os.environ.get("TPU_WORKER_HOSTNAMES") and os.environ.get("TPU_WORKER_ID"):
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    return False
