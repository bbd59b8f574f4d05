"""The driver's BENCH_rN.json keeps only the last 2000 chars of bench.py
stdout and json-parses the FINAL line. Rounds r8-r14 all recorded
``"parsed": null`` because the full per-query map overflowed that
capture — ``compact_headline`` is the repo-side fix and this pins its
contract."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import compact_headline  # noqa: E402


def _result(n_queries: int) -> dict:
    return {
        "metric": "headline_queries_total_wall",
        "value": 96.6,
        "unit": "sec",
        "sf": 0.1,
        "repeat": 3,
        "floor_sec": 0.109,
        "floor_adjusted_total": 89.7,
        "spread_median": 1.08,
        "queries": {
            f"some_rather_long_query_name_number_{i:03d}": round(0.1 * i, 4)
            for i in range(n_queries)
        },
    }


def test_headline_fits_driver_capture_even_for_large_suites():
    line = compact_headline(_result(500), "bench_full_latest.json")
    assert len(line) < 2000  # the driver capture window
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == 96.6
    assert parsed["floor_sec"] == 0.109
    assert parsed["n_queries"] == 500
    assert parsed["queries_file"] == "bench_full_latest.json"
    # slowest-first slice: the most expensive query always survives
    assert "some_rather_long_query_name_number_499" in parsed["queries"]


def test_headline_keeps_full_map_when_it_fits():
    line = compact_headline(_result(5), "x.json")
    assert len(json.loads(line)["queries"]) == 5


def test_headline_single_line_json():
    line = compact_headline(_result(100), "x.json")
    assert "\n" not in line
    json.loads(line)  # valid JSON


def test_headline_no_sidecar():
    parsed = json.loads(compact_headline(_result(3), ""))
    assert parsed["queries_file"] is None
