"""10x-scale probe: synthesize an sf1-equivalent dataset from the
read-only sf0.1 tables and measure the heavy dedup / graph / ANN / ECDF
families on it (r11 verdict item 1 — every prior perf claim rests on
sf0.1; this tool supplies the measured 10x row for SCALE.md).

Synthesis (deterministic, no RNG):

- ``documents``: each replica k remaps ``doc_id += k * ID_OFFSET`` and
  applies a per-replica SUBSTITUTION CIPHER over [a-z]/[0-9]
  (`_cipher_alphabet`; k >= 1; replica 0 is the original). A bijective
  character map preserves every within-replica gram equality — word
  n-grams AND char n-grams map isomorphically, so dedup structure per
  replica == the sf0.1 corpus — while across replicas any gram with an
  alphanumeric differs. Near-dup pairs, components, winnowing overlaps
  therefore grow N× LINEARLY instead of the ~N²× a naive text copy
  would produce. (Replaces the r12 word-suffix scheme, which left
  stem-internal CHAR-grams shared across replicas — VERDICT r13 item 5:
  winnowing's 1000× pair count was a synth artifact.)
- ``embeddings``: ``vec_id += k * ID_OFFSET`` and a per-(replica, dim)
  deterministic sign flip (md5 parity). Sign flips preserve norms and
  every within-replica cosine exactly, while decorrelating replicas, so
  cell populations and pair densities scale linearly.
- ``lineitem`` / ``orders``: ``l_orderkey`` / ``o_orderkey`` shift by
  ``k * ID_OFFSET`` (join integrity preserved); other columns unchanged
  (10 orders per customer key is growth, not corruption).
- small dims (region/nation/customer/supplier/part) copy through
  unchanged; ``events`` copies through (no probe query reads it scaled).

Usage::

    python tools/scale_probe.py [--replicas 10] [--out DIR]
        [--repeat 3] [--skip-build] [--json PATH]

Prints ONE JSON line: per-query best-of-N at the synth scale, the same
queries' time at sf0.1 (measured in the same session), and the
wall ratio per query (linear growth at 10x data => ratio ~<= 10).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_OFFSET = 10**9

# Heavy families: dedup pair joins, connected components, PageRank,
# winnowing overlap, the persisted IVF/PQ lifecycles, semantic dedup,
# the two-pass bucket-offset ECDF (lineitem, 600k -> 6M rows), and the
# component-closure split repair (components + split + two id joins).
PROBE_QUERIES = [
    "dedup_minhash_lsh_documents",
    "dedup_prefix_filter_exact_documents",
    "dedup_components_star_documents",
    "dedup_savings_report_documents",
    "dedup_incremental_new_vs_corpus",
    "pagerank_neardup_documents",
    "winnowing_overlap_pairs_documents",
    "cross_source_neardup_matrix",
    "split_repair_components_documents",
    "semdedup_prune_embeddings",
    "ivf_index_lifecycle_report",
    "ivf_index_pq_report",
    "ivf_probe_sweep_report",
    "ks_drift_price_halves",
    "dedup_components_incremental_documents",
    "lpa_communities_documents",
    "kcenter_coreset_embeddings",
]

COPY_TABLES = ("region", "nation", "customer", "supplier", "part", "events")


def _signs(replica: int, dim: int, ns: str = "") -> list[float]:
    return [
        1.0
        if int(hashlib.md5(f"{ns}{replica}|{d}".encode()).hexdigest(), 16) % 2
        == 0
        else -1.0
        for d in range(dim)
    ]


_SRC_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def _cipher_alphabet(replica: int, ns: str = "") -> str:
    """Deterministic per-replica substitution cipher over the corpus
    alphabet (letters permute among letters, digits among digits —
    Fisher-Yates seeded by md5).

    Why a CIPHER and not the r12 word-suffix scheme (VERDICT r13 item
    5): suffixing every word with ``_k`` preserves WORD-gram structure
    per replica but leaves stem-internal CHAR-grams byte-identical
    across replicas, so char-gram operators (winnowing fingerprints)
    saw cross-replica matches and their pair counts did not scale
    linearly — the 1000× output cardinality was a synth artifact. A
    per-replica bijective character map preserves within-replica
    equality of EVERY gram type (words AND char-n-grams map
    isomorphically), while across replicas any gram containing at
    least one alphanumeric differs — so both word-level and char-level
    pair structure replicate exactly linearly."""
    out = []
    for chars, tag in (
        (list("abcdefghijklmnopqrstuvwxyz"), "L"),
        (list("0123456789"), "D"),
    ):
        seed = int.from_bytes(
            hashlib.md5(f"{ns}cipher|{tag}|{replica}".encode()).digest()
            + hashlib.md5(f"{ns}cipher2|{tag}|{replica}".encode()).digest(),
            "big",
        )
        for i in range(len(chars) - 1, 0, -1):
            seed, j = divmod(seed, i + 1)
            chars[i], chars[j] = chars[j], chars[i]
        out.extend(chars)
    return "".join(out)


def build_synth(
    spark, src_dir: str, out_dir: str, replicas: int,
    ns: str = "", id_offset: int = ID_OFFSET,
) -> None:
    """Synthesize ``replicas`` structure-preserving copies of ``src_dir``
    into ``out_dir``. ``src_dir`` may itself be a synth (the 1000× build
    = 10 OUTER replicas over the 100× synth — pass a distinct ``ns`` so
    outer cipher/sign seeds never collide with inner ones, and a larger
    ``id_offset`` so outer id shifts clear the inner ones; composed
    ciphers stay bijective, so per-replica isomorphism is preserved
    through the nesting)."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    for tbl in COPY_TABLES:
        spark.read.parquet(f"{src_dir}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{tbl}.parquet")

    d = spark.read.parquet(f"{src_dir}/documents.parquet")
    doc_parts = []
    for k in range(replicas):
        part = d.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(k * id_offset)).cast("long")
        )
        if k > 0:
            part = part.withColumn(
                "text",
                F.translate(
                    F.col("text"), _SRC_ALPHABET, _cipher_alphabet(k, ns)
                ),
            )
        doc_parts.append(part)
    docs = doc_parts[0]
    for p in doc_parts[1:]:
        docs = docs.unionByName(p)
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    e = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    dim = len(e.select("embedding").head()["embedding"])
    emb_parts = []
    for k in range(replicas):
        part = e.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(k * id_offset)).cast("long")
        )
        if k > 0:
            sgn = F.array(*[F.lit(s) for s in _signs(k, dim, ns)])
            part = part.withColumn(
                "embedding",
                F.zip_with(
                    F.col("embedding").cast("array<float>"),
                    sgn,
                    lambda x, s: (x * s).cast("float"),
                ),
            )
        emb_parts.append(part)
    embs = emb_parts[0]
    for p in emb_parts[1:]:
        embs = embs.unionByName(p)
    embs.repartition(16).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        base = spark.read.parquet(f"{src_dir}/{tbl}.parquet")
        parts = [
            base.withColumn(key, (F.col(key) + F.lit(k * id_offset)).cast("long"))
            for k in range(replicas)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )


def time_queries(spark, sf_dir: str, names, repeat: int):
    from spark_pipeline_spark.queries import REGISTRY
    from spark_pipeline_spark.session import release_query_caches

    out = {}
    for name in names:
        runs = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 4)
        release_query_caches()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1synth")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--build-only", action="store_true",
        help="synthesize and exit (no query timing)",
    )
    ap.add_argument(
        "--ns", default="",
        help="cipher/sign seed namespace — set (e.g. 'outer|') when "
        "nesting: building N outer replicas over an existing synth",
    )
    ap.add_argument(
        "--id-offset", type=int, default=ID_OFFSET,
        help="per-replica id shift; outer builds over a synth need one "
        "that clears the inner shifts (e.g. 100x ID_OFFSET)",
    )
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated subset of PROBE_QUERIES (default: all)",
    )
    ap.add_argument(
        "--skip-base", action="store_true",
        help="skip the 1x baseline pass (ratios omitted)",
    )
    ap.add_argument(
        "--json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scale_probe_latest.json",
        ),
    )
    args = ap.parse_args()

    from spark_pipeline_spark import get_session

    spark = get_session(
        "scale-probe",
        conf={
            "spark.driver.memory": "16g",
            "spark.sql.shuffle.partitions": "64",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_build:
        t0 = time.perf_counter()
        build_synth(
            spark, args.src, args.out, args.replicas,
            ns=args.ns, id_offset=args.id_offset,
        )
        build_sec = round(time.perf_counter() - t0, 1)
    else:
        build_sec = None
    if args.build_only:
        print(json.dumps({"built": args.out, "replicas": args.replicas,
                          "build_sec": build_sec}))
        spark.stop()
        return 0

    from spark_pipeline_spark.queries import REGISTRY

    wanted = (
        [q.strip() for q in args.queries.split(",")]
        if args.queries
        else PROBE_QUERIES
    )
    names = [n for n in wanted if n in REGISTRY]
    # warm-up
    REGISTRY[names[0]].fn(spark, args.src).count()

    base = (
        {} if args.skip_base
        else time_queries(spark, args.src, names, args.repeat)
    )
    synth = time_queries(spark, args.out, names, args.repeat)
    ratios = {
        n: round(synth[n] / base[n], 2) if base.get(n, 0) > 1e-9 else None
        for n in names
    }
    result = {
        "metric": "scale_probe_wall",
        "unit": "sec",
        "replicas": args.replicas,
        "build_sec": build_sec,
        "repeat": args.repeat,
        "base_sf_dir": args.src,
        "base_total": round(sum(base.values()), 2) if base else None,
        "synth_total": round(sum(synth.values()), 2),
        "total_ratio": (
            round(sum(synth.values()) / sum(base.values()), 2) if base else None
        ),
        "base": base,
        "synth": synth,
        "ratio": ratios,
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
