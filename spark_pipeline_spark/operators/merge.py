"""Upsert / slowly-changing-dimension operators (batch CDC).

North-star additions (no counterpart in the reference, whose sinks are
append/overwrite only — ``sparktools/core.py:171-231``): a training-data
warehouse ingests correction feeds and needs MERGE semantics without a
table format that provides them natively.

Both operators are single-shuffle window plans: union the change feed
with the base, rank per key, keep the winner. At 100 TB the shuffle is
keyed on the merge key only — Catalyst prunes unreferenced columns out
of the exchange, and AQE handles skewed hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "merge_apply_cdc", "scd2_intervals", "table_diff"]


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins MERGE: one surviving row per key, the one with the
    highest ``version_col`` (updates beat base on ties).

    Delta-style ``MERGE INTO`` semantics expressed as a pure batch plan:
    ``unionByName`` → per-key ``max_by`` on (version, side). Insert-only
    rows (keys absent from base) survive automatically; deletes are
    modeled upstream by filtering the feed. One exchange keyed on
    ``keys``; no broadcast assumption on either side, so a 100 TB base
    with a 1 TB daily feed runs the same plan shape.

    Deliberately an AGGREGATION, not a rank window: ``max_by`` partial-
    combines map-side, so the shuffle carries one candidate per
    (partition × key) and a pathologically hot merge key cannot
    bottleneck a single window task (AQE splits skewed aggregations but
    not window shuffles). Feeds should be version-unique per key — two
    feed rows tied on (key, version) yield an arbitrary single winner,
    same as MERGE implementations reject or pick arbitrarily.
    """
    b = base.withColumn("__side", F.lit(0))
    u = updates.withColumn("__side", F.lit(1))
    unioned = b.unionByName(u)
    payload_cols = [c for c in unioned.columns if c not in keys]
    best = unioned.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]),
            F.struct(F.col(version_col), F.col("__side")),
        ).alias("__best")
    )
    out_cols = [F.col(k) for k in keys] + [
        F.col(f"__best.{c}").alias(c) for c in payload_cols if c != "__side"
    ]
    return best.select(*out_cols)


def merge_apply_cdc(
    base: DataFrame,
    feed: DataFrame,
    keys: list[str],
    version_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Tombstone-aware CDC apply: like :func:`merge_upsert`, but the feed
    carries an operation column (insert/update/``delete_op``) and a key
    whose LATEST change is a delete disappears from the result.

    This is the full Debezium/binlog replay contract — upsert-only
    merges silently resurrect deleted keys on the next full compare.
    Plan shape is identical to :func:`merge_upsert`: union, one
    ``max_by`` aggregation keyed on ``keys`` (map-side partial combine,
    AQE-splittable), then a filter on the winner's op. The tombstone
    must WIN before it deletes: a delete at version 5 followed by a
    re-insert at version 6 keeps the key — order comes from
    ``version_col``, never from feed arrival order.

    ``base`` rows carry no op column (they are the surviving state, op
    = no-op); the union tags them with a non-delete marker.
    """
    b = base.withColumn("__side", F.lit(0)).withColumn(op_col, F.lit(""))
    u = feed.withColumn("__side", F.lit(1))
    unioned = b.unionByName(u)
    payload_cols = [c for c in unioned.columns if c not in keys]
    best = unioned.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]),
            F.struct(F.col(version_col), F.col("__side")),
        ).alias("__best")
    )
    alive = best.filter(F.col(f"__best.{op_col}") != F.lit(delete_op))
    out_cols = [F.col(k) for k in keys] + [
        F.col(f"__best.{c}").alias(c)
        for c in payload_cols
        if c not in ("__side", op_col)
    ]
    return alive.select(*out_cols)


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals: each change event
    becomes a validity window ``[valid_from, valid_to)`` per key, with
    ``valid_to`` null (open) on the latest row.

    ``lead(ts)`` over (key, ts, tiebreak) — one window shuffle on the
    key. ``tiebreak_cols`` make the interval chain deterministic when a
    key changes twice at the same timestamp.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table versions: each key classified as
    ``added`` / ``removed`` / ``changed`` / ``unchanged``.

    One full-outer join on the key; change detection compares an md5 of
    the (canonically stringified) payload struct per side, so arbitrarily
    wide payloads cross the shuffle as one 32-hex column each — the wide
    columns are pruned out of the exchange entirely. Each column is
    encoded as ``<null-flag>:<value>`` (flag = ``true``/``false``, NULL
    value coalesced to ``''``) before concatenation: ``concat_ws``
    silently drops NULL operands, and a bare sentinel token (``<null>``)
    would collide with a column whose actual string value IS that token
    — a row changing between the literal and SQL NULL must fingerprint
    as "changed". The distribution-level sibling is
    ``operators/datadiff``; this is the audit for exact
    promote/rollback deltas.
    """
    cols = compare_cols or [c for c in old.columns if c not in keys]

    def fp(df: DataFrame, alias: str) -> DataFrame:
        payload = F.md5(
            F.concat_ws(
                "|",
                *[
                    F.concat(
                        F.col(c).isNull().cast("string"),
                        F.lit(":"),
                        F.coalesce(F.col(c).cast("string"), F.lit("")),
                    )
                    for c in cols
                ],
            )
        )
        return df.select(*keys, payload.alias(alias))

    o = fp(old, "__fp_old")
    n = fp(new, "__fp_new")
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, change.alias("change"))
