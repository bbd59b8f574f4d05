"""Event-time window analytics: tumbling / sliding / session windows and
JSON-props extraction over an events stream table.

North-star capability (SURVEY.md §2.11 — the reference has no time
operators at all; time appears only as string audit columns,
``sparktools/scorer.py:51-57``).

Batch-first, stream-ready: every operator here is expressed with
``F.window`` / ``F.session_window`` / ``from_json``, which run
identically under Structured Streaming (``readStream`` +
``withWatermark`` + the same groupBy) — see
`spark_pipeline_spark.streaming`. At 100 TB the batch shapes matter:

- tumbling/sliding windows are plain groupBy aggregations on a derived
  bucket — partial map-side combine applies, the shuffle carries one row
  per (window × key) per partition;
- session windows shuffle once on the session keys (Spark merges
  overlapping sessions inside the aggregation — no self-join, no window
  function over the full event stream);
- ``from_json`` parses inside codegen; parse once, then prune — never
  regex a JSON string per field.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tumbling_window",
    "sliding_window",
    "session_windows",
    "capped_sessions",
    "with_json_props",
    "funnel_times",
    "ewma_last",
]


def _windowed(
    df: DataFrame,
    window_col: Column,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    out = df.groupBy(window_col.alias("window"), *keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("window", *keys)],
    )


def tumbling_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Non-overlapping event-time buckets (``F.window(ts, duration)``).

    Buckets align to the epoch in the session timezone (engine default
    UTC) — ``window_start = floor(epoch/d)*d`` for second-granularity
    durations, which is what makes results engine-portable.
    """
    return _windowed(df, F.window(F.col(ts_col), duration), keys, aggs)


def sliding_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Overlapping event-time buckets (``F.window(ts, duration, slide)``).

    Each event lands in ``duration/slide`` windows; the fan-out happens
    inside the window expression (no explode + self-join).
    """
    return _windowed(df, F.window(F.col(ts_col), duration, slide), keys, aggs)


def session_windows(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Activity sessions per key: a session extends while consecutive
    events arrive within ``gap`` (``F.session_window``).

    Semantics (shared with the SQL gaps-and-islands formulation the
    oracle uses): an event exactly ``gap`` after its predecessor starts a
    NEW session — session windows are half-open ``[start, last+gap)``.
    One shuffle on ``keys``; Spark merges overlapping session fragments
    inside the aggregation, so there is no per-event window function over
    the whole stream.
    """
    out = df.groupBy(F.session_window(F.col(ts_col), gap), *keys).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        *[c for c in out.columns if c not in ("session_window", *keys)],
    )


def capped_sessions(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    max_duration_seconds: int,
    keys: Sequence[str] = (),
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-event session labels for GAP sessions additionally SPLIT at a
    maximum duration — the capped-sessionization variant
    ``session_window`` can't express (a bot clicking every minute for a
    week is one gap-session forever; downstream session analytics need
    it chunked).

    Semantics: gaps-and-islands on ``gap_seconds`` first; each gap
    session is then cut on a fixed grid of ``max_duration_seconds``
    anchored at the session's first event (``floor(elapsed/cap)``). The
    grid anchoring (rather than restart-at-boundary-event) keeps the
    label a closed-form expression — two window passes over the same
    (keys, ts) sort with NO iteration, so the whole thing is one
    shuffle, and an oracle can replay it exactly.

    Returns the input plus ``session_id`` (per-key ordinal of the gap
    session) and ``session_part`` (the duration split within it).
    ``tiebreak_col`` makes same-timestamp ordering deterministic.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = (
        F.when(
            prev.isNull()
            | (F.col(ts_col).cast("double") - prev.cast("double") > gap_seconds),
            1,
        )
        .otherwise(0)
    )
    with_sid = df.withColumn(
        "session_id",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy(*[F.col(k) for k in keys], F.col("session_id"))
    elapsed = F.col(ts_col).cast("double") - F.min(ts_col).over(ws).cast("double")
    return with_sid.withColumn(
        "session_part", F.floor(elapsed / max_duration_seconds).cast("long")
    )


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_cols: Sequence[str],
    step_seconds: int,
) -> DataFrame:
    """Resample an event stream onto a regular per-key time grid with
    forward-filled values (gap filling).

    For every key, buckets run from floor(min ts) to floor(max ts) in
    ``step_seconds``; each grid point carries the latest observation
    at-or-before it (``ffill_`` columns; leading grid points before the
    first observation are null — honest gaps, not fabricated data).

    Composition, not a new engine primitive: per-key bounds are one
    aggregation, the grid is an exploded ``sequence`` (rows = keys ×
    buckets — size the step accordingly), and the fill is the engine's
    sort-merge :func:`~spark_pipeline_spark.operators.asof.asof_join`.
    Timestamps compare as epoch doubles (µs precision) so ties inside a
    truncated second can't make the pick ambiguous.
    """
    from spark_pipeline_spark.operators.asof import asof_join

    step = int(step_seconds)
    ep = F.floor(F.col(ts_col).cast("double") / step).cast("bigint") * step
    bounds = df.groupBy(*keys).agg(
        F.min(ep).alias("__lo"), F.max(ep).alias("__hi")
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))).alias(
            "bucket_epoch"
        ),
    ).withColumn("__grid_ts", F.col("bucket_epoch").cast("double"))
    right = df.select(
        *keys,
        F.col(ts_col).cast("double").alias("__obs_ts"),
        *[F.col(c) for c in value_cols],
    )
    out = asof_join(
        grid, right, on=list(keys), left_ts="__grid_ts", right_ts="__obs_ts",
        right_prefix="ffill_",
    )
    return out.drop("__grid_ts", "ffill___obs_ts")


def with_json_props(df: DataFrame, json_col: str, schema_ddl: str) -> DataFrame:
    """Parse a JSON-string column into typed fields (``from_json``) and
    flatten them alongside the original columns.

    The explicit DDL schema keeps parsing inside codegen and lets
    Catalyst prune unreferenced fields; schema inference over JSON at
    100 TB would cost an extra full pass.
    """
    parsed = df.withColumn("__props", F.from_json(F.col(json_col), schema_ddl))
    field_names = [f.name for f in parsed.schema["__props"].dataType.fields]
    return parsed.select(
        *df.columns, *[F.col(f"__props.{n}").alias(n) for n in field_names]
    ).drop("__props")


def funnel_times(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Sequential funnel: per entity, the earliest timestamp of each step
    that occurs STRICTLY AFTER the previous step's matched timestamp
    (``t_<step>`` null ⇒ the entity fell out of the funnel there).

    One ``groupBy(entity)`` shuffle collects each entity's events, then a
    single ``aggregate`` fold over the time-sorted event array advances
    all stages in one O(n) pass — no join-per-step chain (k shuffles) and
    no per-step array filter (which Catalyst would re-inline into every
    element visit, going O(k·n²)). Per-entity event lists are bounded by
    entity activity, not corpus size, so the arrays stay small at any
    total scale; a pathological hot entity is an AQE skew split, not a
    plan change.

    Equivalent closed form (the oracle's join-chain): t₁ = min ts of
    step₁; tᵢ = min ts of stepᵢ with ts > tᵢ₋₁.
    """
    ev = F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
    g = df.groupBy(entity_col).agg(F.array_sort(F.collect_list(ev)).alias("__ev"))

    ts_type = df.schema[ts_col].dataType.simpleString()
    init = F.struct(
        *[F.lit(None).cast(ts_type).alias(f"t{i}") for i in range(len(steps))]
    )

    def advance(acc: Column, x: Column) -> Column:
        fields = []
        for i, step in enumerate(steps):
            cur = acc[f"t{i}"]
            cond = cur.isNull() & (x["et"] == step)
            if i > 0:
                prev = acc[f"t{i - 1}"]
                cond = cond & prev.isNotNull() & (x["ts"] > prev)
            fields.append(F.when(cond, x["ts"]).otherwise(cur).alias(f"t{i}"))
        return F.struct(*fields)

    state = F.aggregate(F.col("__ev"), init, advance).alias("__st")
    g = g.select(entity_col, state)
    return g.select(
        entity_col,
        *[F.col(f"__st.t{i}").alias(f"t_{s}") for i, s in enumerate(steps)],
    )


def ewma_last(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_col: str,
) -> DataFrame:
    """Final exponentially-weighted moving average of each entity's
    value sequence: y₁ = x₁, yₙ = α·xₙ + (1−α)·yₙ₋₁ — the classic
    smoothing recurrence, evaluated as a single ``aggregate`` fold over
    the time-sorted event array (the same one-shuffle-then-fold shape
    as :func:`funnel_times`; a recurrence can't be a window frame).

    Closed form (the oracle's formulation):
    yₙ = α·Σᵢ₌₂..ₙ (1−α)^(n−i)·xᵢ + (1−α)^(n−1)·x₁.
    """
    ev = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        F.col(value_col).cast("double").alias("v"),
    )
    g = df.groupBy(entity_col).agg(F.array_sort(F.collect_list(ev)).alias("__ev"))
    init = F.struct(
        F.lit(None).cast("double").alias("y"), F.lit(0).alias("seen")
    )

    def step(acc: Column, x: Column) -> Column:
        y = F.when(acc["seen"] == 0, x["v"]).otherwise(
            F.lit(alpha) * x["v"] + F.lit(1.0 - alpha) * acc["y"]
        )
        return F.struct(y.alias("y"), (acc["seen"] + 1).alias("seen"))

    st = F.aggregate(F.col("__ev"), init, step)
    return g.select(
        entity_col,
        st["y"].alias("ewma"),
        st["seen"].cast("bigint").alias("n_obs"),
    )
