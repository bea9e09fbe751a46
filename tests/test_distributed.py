"""Multi-host wiring smoke (parallel/distributed.py; VERDICT r1 item 7).

Launches TWO real OS processes that rendezvous through
`maybe_initialize_distributed()` (JAX_COORDINATOR_ADDRESS env contract) on the
CPU backend and run a cross-process allgather — the same code path
scripts/train.py now takes on a TPU pod, minus the ICI.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
sys.path.insert(0, os.environ["CONTROLLORA_REPO"])
from controllora_tpu.parallel.distributed import maybe_initialize_distributed
ok = maybe_initialize_distributed()
import jax
assert ok, "maybe_initialize_distributed returned False"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
import numpy as np
from jax.experimental import multihost_utils
got = multihost_utils.process_allgather(np.array([jax.process_index() + 1]))
assert sorted(np.asarray(got).ravel().tolist()) == [1, 2], got
print("DIST_OK", jax.process_index(), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_rendezvous():
    port = _free_port()
    base = dict(os.environ)
    base.pop("XLA_FLAGS", None)  # 1 CPU device per process
    base.update(
        JAX_PLATFORMS="cpu",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        CONTROLLORA_REPO=REPO,
        PYTHONPATH="",  # drop any sitecustomize forcing a different platform
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER],
            env={**base, "JAX_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"DIST_OK {i}" in out


def test_single_process_is_noop(monkeypatch):
    from controllora_tpu.parallel.distributed import maybe_initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert maybe_initialize_distributed() is False
