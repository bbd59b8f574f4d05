"""As-of (time-travel) join: for each left row, the most recent right row
at-or-before its timestamp, per key.

Spark has no native ASOF JOIN (SPARK-22947 is open); the naive
formulations are disastrous at scale — a range θ-join explodes to
cartesian-per-key, and a correlated subquery re-scans the right side per
row. This operator uses the **union + ordered carry-forward** shape,
which is the sort-merge as-of:

1. tag and union both inputs on (key, ts) — no join at all;
2. one shuffle on the key, one in-partition sort on (ts, tag);
3. ``last(right_payload, ignorenulls=True)`` over rows-unbounded-
   preceding carries the latest right payload forward;
4. keep the left rows.

Cost: one shuffle + sort per side — identical asymptotics to a regular
sort-merge join, independent of time-gap sizes. Ties (left.ts ==
right.ts) match, because right rows sort before left rows at equal
timestamps — the standard inclusive as-of semantics (DuckDB ASOF JOIN,
pandas merge_asof defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    right_prefix: str = "asof_",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus the columns of the latest
    right row with ``right_ts <= left_ts`` for the same key(s) (nulls
    when no prior right row exists).

    Right columns (except keys/timestamp) come back prefixed with
    ``right_prefix``. Keys must be equality keys; the timestamp is the
    as-of ordering column.

    ``tolerance_seconds`` mirrors pandas ``merge_asof(tolerance=...)``:
    a match older than the tolerance is DROPPED (nulls), not replaced by
    an even older one — only the latest prior row ever counts, the
    tolerance just decides whether it is still fresh enough. Applied as
    a post-carry mask, so the plan shape (one shuffle + sort per side,
    zero join nodes) is unchanged.

    ``direction``: ``"backward"`` (default) matches the latest right row
    with ``right_ts <= left_ts``; ``"forward"`` matches the EARLIEST
    right row with ``right_ts >= left_ts`` (the next-scheduled-event
    pattern — pandas ``merge_asof(direction="forward")``). Forward is
    the same carry over the time-reversed sort; with a tolerance, the
    match must be within ``tolerance_seconds`` AFTER the left row.
    ``"nearest"`` takes whichever of the two is closer in time (equal
    distance → backward, matching pandas); implemented as BOTH carries
    over ONE exchange — same hash partitioning, two in-partition sorts,
    still zero join nodes — with a per-row closest-gap choice. A
    tolerance bounds the winning gap's absolute size.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts

    payload_cols = [c for c in right.columns if c not in keys]
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])

    # both union sides need identical schemas: derive each side's struct
    # type once and null-cast it on the other side
    r_struct_type = right.select(payload.alias("__r")).schema["__r"].dataType
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),  # left sorts AFTER right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        payload.alias("__r"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # md5 of the right payload as the final sort key: when the right side
    # has several rows at the same (key, ts), the carried match is the
    # max-md5 one — deterministic across partitionings and reruns instead
    # of an arbitrary partition-dependent pick. Forward direction = the
    # identical carry over the time-REVERSED sort (right rows still sort
    # before left rows at equal ts, preserving inclusive ties).
    def _window(ts_order):
        return (
            Window.partitionBy(*keys)
            .orderBy(ts_order, F.col("__tag"), F.md5(F.to_json(F.col("__r"))))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    if direction == "nearest":
        # both carries share the hash partitioning on the keys: one
        # exchange, two in-partition sorts, then a per-row gap compare
        back = F.last("__r", ignorenulls=True).over(_window(F.col("__ts")))
        fwd = F.last("__r", ignorenulls=True).over(_window(F.col("__ts").desc()))
        carried = unioned.withColumn("__mb", back).withColumn("__mf", fwd)
        gb = F.col("__ts").cast("double") - F.col(f"__mb.{right_ts}").cast("double")
        gf = F.col(f"__mf.{right_ts}").cast("double") - F.col("__ts").cast("double")
        if tolerance_seconds is not None:
            tol = float(tolerance_seconds)
            carried = carried.withColumn(
                "__mb", F.when(F.col("__mb").isNotNull() & (gb <= tol), F.col("__mb"))
            ).withColumn(
                "__mf", F.when(F.col("__mf").isNotNull() & (gf <= tol), F.col("__mf"))
            )
        take_back = F.col("__mb").isNotNull() & (
            F.col("__mf").isNull() | (gb <= gf)
        )
        carried = carried.withColumn(
            "__match", F.when(take_back, F.col("__mb")).otherwise(F.col("__mf"))
        )
    else:
        ts_order = (
            F.col("__ts") if direction == "backward" else F.col("__ts").desc()
        )
        carried = unioned.withColumn(
            "__match", F.last("__r", ignorenulls=True).over(_window(ts_order))
        )

        if tolerance_seconds is not None:
            gap = F.col("__ts").cast("double") - F.col(f"__match.{right_ts}").cast(
                "double"
            )
            if direction == "forward":
                gap = -gap
            carried = carried.withColumn(
                "__match",
                F.when(
                    F.col("__match").isNotNull()
                    & (gap <= float(tolerance_seconds)),
                    F.col("__match"),
                ),
            )

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in payload_cols
    ]
    return carried.filter(F.col("__tag") == 1).select(*out_cols)
