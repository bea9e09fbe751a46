"""Driver-interface tests: the multichip dry-run executes on the virtual CPU mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_2dev():
    import __graft_entry__ as entry

    entry.dryrun_multichip(2)


def test_dryrun_self_provisions_without_conftest_env():
    """The driver calls dryrun_multichip(8) in a process with ONE device (axon TPU
    tunnel). Simulate that: a subprocess with a single-CPU-device backend must
    self-provision the 8-device virtual mesh by re-exec (VERDICT round-1 item 1)."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""
    env["XLA_FLAGS"] = ""  # 1 CPU device only -> forces the re-exec path
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r); " % repo
            + "import jax; assert len(jax.devices()) == 1; "
            + "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=840,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in out.stdout


def test_entry_signature():
    import __graft_entry__ as entry

    assert callable(entry.entry)
    assert callable(entry.dryrun_multichip)
