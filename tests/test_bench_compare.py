"""tools/bench_compare.py: floor adjustment, flagging, and the
floor-bound exemption — pure-python, no Spark session."""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

TOOL = pathlib.Path(__file__).resolve().parent.parent / "tools" / "bench_compare.py"


def _write(tmp_path, name, queries, floor):
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries, "floor_sec": floor}))
    return str(p)


def _run(*args):
    return subprocess.run(
        [sys.executable, str(TOOL), *args], capture_output=True, text=True
    )


def test_floor_bound_queries_are_never_flagged(tmp_path):
    """A floor-bound query more than doubling its raw time is box noise, not a plan
    regression — reported but exit 0; a real adjusted regression on a
    non-floor-bound query flags and exits 1."""
    old = _write(tmp_path, "old.json",
                 {"tiny": 0.12, "big": 2.0, "steady": 1.0}, 0.1)
    new = _write(tmp_path, "new.json",
                 {"tiny": 0.28, "big": 2.1, "steady": 1.05}, 0.1)
    r = _run(old, new)
    assert r.returncode == 0, r.stdout
    assert "flagged" in r.stdout and "none" in r.stdout

    worse = _write(tmp_path, "worse.json",
                   {"tiny": 0.12, "big": 4.5, "steady": 1.0}, 0.1)
    r2 = _run(old, worse)
    assert r2.returncode == 1
    assert "big" in r2.stdout and "FLAG" in r2.stdout


def test_added_and_removed_queries_reported(tmp_path):
    old = _write(tmp_path, "a.json", {"q1": 1.0, "q2": 1.0}, 0.05)
    new = _write(tmp_path, "b.json", {"q1": 1.0, "q3": 1.0}, 0.05)
    r = _run(old, new)
    assert r.returncode == 0
    assert "added (1): q3" in r.stdout
    assert "removed (1): q2" in r.stdout


def test_floor_mismatch_flags_comparison_not_queries(tmp_path):
    """VERDICT r13: a loaded driver box (floor 0.158s vs quiet 0.078s)
    produced 13 phantom per-query regressions. When the two runs' floors
    differ by more than the guard factor, the COMPARISON is flagged once
    (exit 2) and per-query flags are suppressed."""
    quiet = _write(tmp_path, "quiet.json",
                   {"tiny": 0.15, "big": 2.0}, 0.078)
    loaded = _write(tmp_path, "loaded.json",
                    {"tiny": 0.60, "big": 3.9}, 0.158)
    r = _run(quiet, loaded)
    assert r.returncode == 2, r.stdout
    assert "COMPARISON FLAGGED" in r.stdout
    assert "load-contaminated" in r.stdout
    assert "FLAG\n" not in r.stdout  # no per-query flag markers survive

    # symmetric: a loaded OLD side also trips the guard
    r2 = _run(loaded, quiet)
    assert r2.returncode == 2

    # floors within the guard: normal per-query flagging still works
    near = _write(tmp_path, "near.json",
                  {"tiny": 0.16, "big": 4.5}, 0.09)
    r3 = _run(quiet, near)
    assert r3.returncode == 1
    assert "big" in r3.stdout and "FLAG" in r3.stdout


def test_adjusted_totals_use_each_files_own_floor(tmp_path):
    """raw 1.0s->1.0s with floors 0.0->0.5 must show adjusted 1.0->0.5."""
    old = _write(tmp_path, "c.json", {"q": 1.0}, 0.0)
    new = _write(tmp_path, "d.json", {"q": 1.0}, 0.5)
    r = _run(old, new)
    assert "floor-adjusted 1.00s -> 0.50s" in r.stdout
