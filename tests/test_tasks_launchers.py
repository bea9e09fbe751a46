"""Canned task launchers must not drift from the CLIs they pin.

Every tasks/{train,test}_*.py resolves to a (script, argv) pair; this runs each
launcher with the spawn stubbed out and feeds its argv to the target script's
real argparse — an unknown/renamed flag or a missing required argument fails
here instead of at launch time (the reference's tasks/*.py are unchecked
`os.system` strings, e.g. tasks/train_canny.py:14-25)."""

import glob
import os
import runpy
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TASKS = os.path.join(ROOT, "tasks")
SCRIPTS = os.path.join(ROOT, "scripts")
for p in (TASKS, SCRIPTS):
    if p not in sys.path:
        sys.path.insert(0, p)

LAUNCHERS = sorted(
    os.path.basename(f)
    for f in glob.glob(os.path.join(TASKS, "*.py"))
    if os.path.basename(f).startswith(("train_", "test_"))
)


def _capture_launch(task_file):
    import _launch

    captured = {}

    def fake_run(script, args):
        captured["script"], captured["args"] = script, list(args)
        return 0

    orig = _launch.run
    _launch.run = fake_run
    try:
        old_argv = sys.argv
        sys.argv = [task_file]
        try:
            runpy.run_path(os.path.join(TASKS, task_file), run_name="__main__")
        except SystemExit as e:
            assert e.code in (0, None), f"{task_file} exited {e.code}"
        finally:
            sys.argv = old_argv
    finally:
        _launch.run = orig
    assert captured, f"{task_file} never invoked _launch.run"
    return captured["script"], captured["args"]


def test_all_reference_tasks_present():
    # the reference ships 7 train_* + 7 test_* launchers (tasks/, SURVEY §2)
    assert len(LAUNCHERS) == 14, LAUNCHERS


@pytest.mark.parametrize("task_file", LAUNCHERS)
def test_launcher_flags_accepted(task_file):
    script, args = _capture_launch(task_file)
    mod = {"train.py": "train", "sample.py": "sample",
           "train_dreambooth.py": "train_dreambooth",
           "mix_lora.py": "mix_lora"}[script]
    parse_args = __import__(mod).parse_args
    ns = parse_args(args)  # SystemExit(2) here = flag drift
    assert ns is not None
