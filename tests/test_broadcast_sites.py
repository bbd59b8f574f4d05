"""Source-level broadcast gate for OPERATOR APIs.

`tests/test_plans.py::test_no_forced_broadcast_of_sf_growing_frames`
audits every *registered query's* analyzed plan, but an operator module
exercised only through its own pytest entry points never passes through
that gate — the blind spot that let `dedup_representatives` force-
broadcast a corpus-scaling `losers` frame until r9's verdict caught it.

This sweep closes the gap at the source level: every `F.broadcast(`
call site in the package OUTSIDE `queries.py` (those are plan-gated)
must appear below with a justification for why the broadcast side is
bounded — by construction (one-row aggregate, fixed bucket/group
count) or by an external contract (fixed query set, k centroids, a
benchmark suite). A new operator-level broadcast fails here until it is
deliberately allowlisted, exactly like `_BOUNDED_HINTS` for queries.

Keyed on (module-relative path, first identifier of the broadcast
argument) so the gate survives line drift but still notices a NEW
frame being hinted in an existing module.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "spark_pipeline_spark"

# (relative path, broadcast-arg identifier) -> why the side is bounded
_ALLOWED = {
    ("streaming.py", "dim"): "stream-side dimension table by API contract "
    "(enrich-stream-with-dim join; dims are bounded, the stream is not)",
    ("streaming.py", "centroids"): "k-cell centroid frame by API contract "
    "(semantic dedup sink's blocking key; never retrained, never "
    "corpus-scaling)",
    ("operators/training.py", "weights"): "one-row GD weight frame per round",
    ("operators/bloomjoin.py", "bitmap"): "one-row bloom-bitmap aggregate",
    ("operators/similarity.py", "q"): "fixed query set by API contract "
    "(brute-force / IVF probe side)",
    ("operators/similarity.py", "cen"): "k seed centroids (fixed cell count)",
    ("operators/similarity.py", "qn"): "fixed query set × nprobe cells "
    "(multiprobe side, with its norms precomputed)",
    ("operators/similarity.py", "pv"): "one-row power-iteration direction",
    ("operators/sampling.py", "proportions"): "per-group proportions: "
    "bounded group count by stratification contract",
    ("operators/sampling.py", "totals"): "per-bucket totals: fixed bucket count",
    ("operators/sampling.py", "fractions"): "per-stratum fractions: "
    "bounded strata count",
    ("operators/sampling.py", "rates"): "per-stratum rates: bounded strata count",
    ("operators/sampling.py", "bounds"): "one-row quantile-bounds aggregate",
    ("operators/layout.py", "bounds"): "one-row z-order bounds aggregate",
    ("operators/dedup.py", "bench_hashes"): "benchmark-suite grams: bounded "
    "by the benchmark, not the corpus (decontamination contract); the "
    "downstream contaminated-id set is corpus-scaling and deliberately "
    "carries NO hint (AQE decides)",
    ("ann_index.py", "cen"): "persisted centroid table: k cells by build "
    "contract",
    ("ann_index.py", "q_probes"): "fixed query set × nprobe cells "
    "(search API contract; the corpus side never shuffles)",
    ("ann_index.py", "qv"): "fixed query set (float rerank side of the "
    "int8 search; corpus shortlist is |queries|*k*oversample rows)",
    ("ann_index.py", "tot"): "one-row per-cell-totals aggregate",
    ("operators/packing.py", "offsets"): "per-bucket offsets: fixed bucket count",
    ("operators/packing.py", "bounds"): "one-row length-quantile bounds",
    ("ann_index.py", "codebook"): "PQ codebook: M*K subvector rows by "
    "build contract (trained once, fixed across refreshes)",
    ("ann_index.py", "cb"): "PQ codebook: M*K rows (PQ search / stats "
    "read side)",
    ("ann_index.py", "adc"): "query ADC distance table: |queries|*M*K "
    "rows (fixed query set by search API contract)",
    ("ann_index.py", "q"): "fixed query set (float rerank side of the "
    "PQ search; corpus shortlist is |queries|*k*oversample rows)",
}

_SITE_RE = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")


def _sites():
    for path in sorted(PKG.rglob("*.py")):
        rel = path.relative_to(PKG).as_posix()
        if rel == "queries.py":  # plan-gated per registered query
            continue
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            m = _SITE_RE.search(line)
            if m:
                yield rel, m.group(1), lineno


def test_every_operator_broadcast_site_is_justified():
    unknown = [
        f"{rel}:{lineno} F.broadcast({arg}…)"
        for rel, arg, lineno in _sites()
        if (rel, arg) not in _ALLOWED
    ]
    assert not unknown, (
        "operator-level F.broadcast() sites without a boundedness "
        f"justification: {unknown} — remove the hint (let AQE decide) or "
        "allowlist it in tests/test_broadcast_sites.py with why the "
        "broadcast side cannot grow with the corpus"
    )


def test_allowlist_has_no_stale_entries():
    live = {(rel, arg) for rel, arg, _ in _sites()}
    stale = sorted(set(_ALLOWED) - live)
    assert not stale, f"allowlisted broadcast sites no longer in source: {stale}"
