"""Driver-interface tests: the multichip dry-run executes on the virtual CPU mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_2dev():
    import __graft_entry__ as entry

    entry.dryrun_multichip(2)


def test_entry_signature():
    import __graft_entry__ as entry

    assert callable(entry.entry)
    assert callable(entry.dryrun_multichip)
