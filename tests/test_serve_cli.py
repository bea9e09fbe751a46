"""scripts/serve.py CLI surface: preset -> speed-knob mapping (no server spin-up).

The preset table must stay in lockstep with docs/BENCHMARKS.md "accelerated
presets" and scripts/eval_presets.py PRESETS."""

import sys

sys.path.insert(0, ".")

from scripts.serve import parse_args


def test_default_is_exact():
    a = parse_args([])
    assert (a.preset, a.tome_ratio, a.deepcache_interval) == ("exact", 0.0, 1)


def test_preset_values():
    assert (parse_args(["--preset", "tome"]).tome_ratio,
            parse_args(["--preset", "tome"]).deepcache_interval) == (0.5, 1)
    turbo = parse_args(["--preset", "turbo"])
    assert (turbo.tome_ratio, turbo.deepcache_interval) == (0.5, 2)


def test_explicit_flags_override_preset():
    a = parse_args(["--preset", "turbo", "--deepcache_interval", "3"])
    assert (a.tome_ratio, a.deepcache_interval) == (0.5, 3)
    a = parse_args(["--preset", "exact", "--tome_ratio", "0.3"])
    assert (a.tome_ratio, a.deepcache_interval) == (0.3, 1)


def test_matches_eval_presets_table():
    from scripts.eval_presets import PRESETS

    assert PRESETS["exact"] == (0.0, 1)
    assert PRESETS["tome50"] == (0.5, 1)
    assert PRESETS["turbo"] == (0.5, 2)
    for name, cli in (("exact", "exact"), ("tome50", "tome"), ("turbo", "turbo")):
        a = parse_args(["--preset", cli])
        assert (a.tome_ratio, a.deepcache_interval) == PRESETS[name]
