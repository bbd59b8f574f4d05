"""Sampling, limits, and grouped top-k.

Parity targets (SURVEY.md §2.7): deterministic limit (``sparktools/
core.py:23-27``), seeded Bernoulli sample (``core.py:162-163``),
stratified quota sampling ``proportion_samples`` (``core.py:525-547``).

Determinism strategy: the reference's randomness (fixed seed 4233, and a
``row_number`` window with *no* orderBy — nondeterministic row choice,
``core.py:543``) is replaced by **content-hash randomness** (md5 of key
columns). That gives: (a) identical results on reruns regardless of
partitioning or cluster size, (b) oracle-verifiable sampling (DuckDB
computes the same md5), (c) no shuffle for Bernoulli sampling — it is a
pure filter, pushed to the scan.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_pipeline_spark.functions import md5_int, md5_unit


def _key_hash(df: DataFrame, key_cols: list[str] | None) -> Column:
    """Uniform [0,1) draw per row from the md5 of the key columns.

    ``key_cols=None`` hashes *every* column — that forces the scan to read
    all columns (defeats pruning) and changes sample membership whenever an
    unrelated column is added, so it warns. Pass explicit keys in real
    pipelines.
    """
    if not key_cols:
        warnings.warn(
            "sampling without explicit key_cols hashes all columns: the scan "
            "cannot prune columns and sample membership changes if any column "
            "is added — pass key_cols",
            stacklevel=3,
        )
    cols = key_cols if key_cols else list(df.columns)
    if len(cols) == 1:
        basis = F.col(cols[0]).cast("string")
    else:
        # '|'-joined string form of the key tuple; concat_ws skips nulls,
        # which is fine for a sampling draw (stable either way).
        basis = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    return md5_unit(basis)


def hash_sample(df: DataFrame, fraction: float, key_cols: list[str] | None = None) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key-hash < fraction.

    Replaces ``df.sample(False, fraction, seed=4233)`` (``core.py:162-163``)
    with a content-keyed filter. Unlike ``sample()`` — whose draw depends on
    partition layout — this is stable under repartitioning and across
    engines, and it is a plain predicate: no shuffle, pushable, and
    consistent between two datasets sharing the same keys (useful for
    joining sampled fact tables).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(_key_hash(df, key_cols) < F.lit(fraction))


def hash_split_predicate(fraction: float, key_cols: list[str]) -> Column:
    """The :func:`hash_sample` draw as a standalone predicate Column:
    ``filter(pred)`` and ``filter(~pred)`` partition a table into
    complementary deterministic halves (reference vs current for drift,
    train vs holdout) — both sides stable under repartitioning and
    identical cross-engine. Explicit ``key_cols`` required: a predicate
    detached from its DataFrame can't fall back to "all columns"."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if len(key_cols) == 1:
        basis = F.col(key_cols[0]).cast("string")
    else:
        basis = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return md5_unit(basis) < F.lit(fraction)


def deterministic_limit(df: DataFrame, n: int, order_by: list[str] | None = None) -> DataFrame:
    """First-n rows; stable across reruns ONLY when ``order_by`` is given.

    The reference implements this with ``rdd.zipWithIndex`` (``core.py:
    23-27``) — an RDD hop that kills column pruning. With an explicit
    ``order_by`` this is a global top-n: Spark executes it as per-partition
    TakeOrdered + merge on the driver — no full sort, no full shuffle.
    Without ``order_by`` it falls back to plain ``limit``, which (like the
    reference's zipWithIndex after a shuffle) is NOT guaranteed stable
    across reruns — pass ``order_by`` whenever determinism matters.
    """
    if order_by:
        return df.orderBy(*order_by).limit(n)
    return df.limit(n)


def grouped_top_k(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    order_by: list[Column | str] | None = None,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """At most k rows per group (SURVEY.md §2.7 L5 / W1 pattern).

    ``order_by=None`` reproduces the reference's "arbitrary k rows"
    semantics but deterministically: rows are ranked by md5 of the
    tie-break columns (default: all non-group columns). One shuffle on
    ``group_cols``; with AQE, skewed groups split automatically.
    """
    if order_by is None:
        basis = tie_break if tie_break else [c for c in df.columns if c not in group_cols]
        order_by = [md5_int(F.concat_ws("|", *[F.col(c).cast("string") for c in basis]))]
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def proportion_samples(
    df: DataFrame,
    proportions: DataFrame,
    count_column: str = "rows_count",
    order_by: list[Column | str] | None = None,
) -> DataFrame:
    """Stratified quota sampling (``proportion_samples`` parity,
    ``sparktools/core.py:525-547``).

    ``proportions`` holds the stratification key columns plus a
    ``count_column`` quota. Semantics: inner-join fact rows to their
    stratum quota, take at most ``quota`` rows per stratum.

    Spark-first shape: the quota table is tiny → **broadcast** join (no
    fact-table shuffle for the join); the per-stratum pick is one window
    shuffle on the strata keys. The reference's window has no orderBy
    (nondeterministic pick, ``core.py:543`` — SURVEY.md §2.13.4); default
    ordering here is the content-hash of the full row key, i.e. a
    deterministic uniform pick per stratum.
    """
    groupers = [c for c in proportions.columns if c != count_column]
    joined = df.join(F.broadcast(proportions), on=groupers, how="inner")
    if order_by is None:
        basis = [c for c in df.columns if c not in groupers]
        order_by = [md5_int(F.concat_ws("|", *[F.col(c).cast("string") for c in basis]))]
    w = Window.partitionBy(*groupers).orderBy(*order_by)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col(count_column))
        .drop("__rn", count_column)
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list[str],
) -> DataFrame:
    """Weight-proportional sample of ``k`` rows without replacement
    (Efraimidis-Spirakis A-ES): rank rows by ``u^(1/w)`` descending,
    where ``u`` is the row's deterministic md5 draw and ``w`` its weight
    — heavier rows win more often, exactly with probability ∝ w.

    Deterministic (content-hash draw → same sample under any
    partitioning, rerun, or engine) and scale-cheap: the ranking is a
    global top-k, which Spark executes as per-partition TakeOrdered +
    driver merge — no full sort. Rows with weight ≤ 0 never win.
    """
    u = _key_hash(df, key_cols)
    w = F.col(weight_col).cast("double")
    # u^(1/w) for w>0; -1 sorts non-positive weights last
    priority = F.when(w > 0, F.pow(u, 1.0 / w)).otherwise(F.lit(-1.0))
    return (
        df.withColumn("__priority", priority)
        .orderBy(F.desc("__priority"), *key_cols)
        .limit(k)
        .drop("__priority")
    )


def stratified_fraction_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli sampling with per-key fractions.

    The fraction-quota sibling of :func:`proportion_samples` (Spark's
    ``sampleBy``, made deterministic): keep a row iff its content hash is
    under its stratum's fraction. Pure filter — no shuffle at all.
    Pass ``key_cols`` (the row-identity columns) so the draw doesn't hash
    every column.
    """
    frac = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    draw = _key_hash(df, key_cols)
    stratum_frac = F.element_at(frac, F.col(strata_col).cast("string"))
    return df.filter(draw < F.coalesce(stratum_frac, F.lit(0.0)))


def _key_basis(df: DataFrame, key_cols: list[str]) -> Column:
    """String basis of the key tuple ('|'-joined casts), the input every
    deterministic draw hashes."""
    if len(key_cols) == 1:
        return F.col(key_cols[0]).cast("string")
    return F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_col: str,
    key_cols: list[str],
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic prefix sample under a token budget.

    Rows are ranked by their content-hash draw (a deterministic global
    shuffle order); a row is kept iff the total of ``token_col`` over all
    strictly-preceding rows is below ``budget`` — take documents in hash
    order until the budget is spent. The row that crosses the budget
    line is included, so the sample always reaches the budget. This is
    the "cut an N-token training set out of the corpus" primitive.

    Scale shape: the naive form is a global ORDER BY + running sum — a
    single-partition window, dead at 100 TB. Instead the 2^32 hash space
    is cut into ``n_buckets`` fixed ranges: one groupBy computes
    per-bucket token totals (``n_buckets`` rows), a prefix sum over that
    tiny frame classifies each bucket as fully-in / fully-out /
    straddling, and only the ~1/n_buckets of rows in the straddling
    bucket pay a within-bucket running-sum window. Everything else is a
    broadcast join + filter. The result is bit-identical to the naive
    global-window form (same (hash, key) order; bucket ranges are
    order-compatible prefixes of it).
    """
    width = (1 << 32) // n_buckets
    u = md5_int(_key_basis(df, key_cols))
    tagged = df.withColumn("__u", u).withColumn(
        "__bucket", F.floor(F.col("__u") / F.lit(width)).cast("bigint")
    )
    tok = F.col(token_col).cast("bigint")

    totals = tagged.groupBy("__bucket").agg(F.sum(tok).alias("__btot"))
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    # ≤ n_buckets rows: the single-partition window here is trivially small.
    totals = totals.withColumn(
        "__bprefix", F.coalesce(F.sum("__btot").over(wb), F.lit(0))
    )

    joined = tagged.join(F.broadcast(totals), "__bucket")
    bprefix, btot = F.col("__bprefix"), F.col("__btot")
    helper = ["__u", "__bucket", "__btot", "__bprefix"]

    fully_in = joined.filter(bprefix + btot < budget).drop(*helper)
    straddle = joined.filter((bprefix < budget) & (bprefix + btot >= budget))
    wrow = (
        Window.partitionBy("__bucket")
        .orderBy("__u", *key_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    strad_in = (
        straddle.withColumn(
            "__rprefix", bprefix + F.coalesce(F.sum(tok).over(wrow), F.lit(0))
        )
        .filter(F.col("__rprefix") < budget)
        .drop("__rprefix", *helper)
    )
    return fully_in.unionByName(strad_in)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    budget: float,
    token_col: str,
    key_cols: list[str],
) -> DataFrame:
    """Weight-targeted mixture sampling: subsample each stratum so the
    *expected* token total is ``budget * w_s / Σw`` — the training-mix
    primitive ("40% web, 30% code, …, capped at N tokens total").

    Per-stratum availability ``T_s`` comes from one tiny aggregate
    (broadcast back); the keep-fraction is ``min(1, target_s / T_s)`` —
    strata that cannot fill their quota are taken whole (no upweighting;
    resampling with replacement is a separate concern). Strata absent
    from ``weights`` get fraction 0. The draw is the deterministic md5
    content hash, so membership is stable across reruns, partitionings,
    and engines, and the final sample is a pure broadcast-join + filter:
    no shuffle of the fact table at any scale.
    """
    sumw = float(sum(weights.values()))
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    tok = F.col(token_col).cast("bigint")

    totals = df.groupBy(strata_col).agg(F.sum(tok).cast("double").alias("__stok"))
    weight = F.element_at(wmap, F.col(strata_col).cast("string"))
    # zero-token strata (all-null/empty token counts) keep no rows —
    # guarded so ANSI mode doesn't abort the job with DIVIDE_BY_ZERO
    frac = F.when(
        F.col("__stok") > 0,
        F.least(
            F.lit(1.0),
            F.coalesce(weight, F.lit(0.0))
            * F.lit(float(budget)) / F.lit(sumw) / F.col("__stok"),
        ),
    ).otherwise(F.lit(0.0))
    fractions = totals.withColumn("__frac", frac)

    tagged = df.withColumn("__draw", _key_hash(df, key_cols))
    return (
        tagged.join(F.broadcast(fractions.select(strata_col, "__frac")), strata_col)
        .filter(F.col("__draw") < F.col("__frac"))
        .drop("__draw", "__frac")
    )


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    budget: float,
    token_col: str,
    key_cols: list[str],
    copy_col: str = "copy_id",
) -> DataFrame:
    """Mixture sampling WITH replacement: the upsampling sibling of
    :func:`mixture_sample`. Each stratum's rows are repeated so the
    expected token total hits ``budget * w_s / Σw`` even when that
    exceeds availability — epoch-style oversampling of scarce
    high-weight sources in a training mix.

    The per-stratum rate ``r = target_s / T_s`` (uncapped) yields
    ``floor(r)`` guaranteed copies per row plus one more with
    probability ``frac(r)``, drawn from the row's deterministic md5
    hash — E[copies] = r exactly. Output rows carry ``copy_col``
    (1..n) distinguishing the repeats. Same scale shape as
    mixture_sample: one tiny aggregate broadcast back, then a pure
    per-row explode — the corpus never shuffles. Strata absent from
    ``weights`` produce no rows.
    """
    sumw = float(sum(weights.values()))
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    tok = F.col(token_col).cast("bigint")

    totals = df.groupBy(strata_col).agg(F.sum(tok).cast("double").alias("__stok"))
    weight = F.element_at(wmap, F.col(strata_col).cast("string"))
    # zero-token strata produce no copies (same guard as mixture_sample)
    rate = F.when(
        F.col("__stok") > 0,
        F.coalesce(weight, F.lit(0.0)) * F.lit(float(budget)) / F.lit(sumw)
        / F.col("__stok"),
    ).otherwise(F.lit(0.0))
    rates = totals.withColumn("__rate", rate).select(strata_col, "__rate")

    tagged = df.withColumn("__draw", _key_hash(df, key_cols))
    n_full = F.floor(F.col("__rate")).cast("bigint")
    extra = (F.col("__draw") < (F.col("__rate") - n_full)).cast("bigint")
    copies = (n_full + extra).alias("__copies")
    return (
        tagged.join(F.broadcast(rates), strata_col)
        .withColumn("__copies", copies)
        .withColumn(
            copy_col,
            F.explode(
                F.when(
                    F.col("__copies") >= 1,
                    F.sequence(F.lit(1).cast("bigint"), F.col("__copies")),
                ).otherwise(F.array().cast("array<bigint>"))
            ),
        )
        .drop("__draw", "__rate", "__copies")
    )


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Tag each row with its quantile bucket (0..len(probs)): bucket =
    number of boundary quantiles ≤ the row's value, with boundaries the
    exact interpolated percentiles of ``value_col`` at ``probs``.

    Curriculum bucketing / outlier fencing without a global sort: one
    aggregate computes the boundary array, which rides to every row via
    a broadcast of a single row (not a driver collect), and the bucket
    index is a pure fold over that array. ``ntile`` would need a total
    order (range-shuffle of the whole table) and has engine-specific tie
    behavior; comparing against shared interpolated boundaries is
    deterministic in any engine at any scale. Exact percentiles sort
    within the aggregate — for bounded-memory estimation at extreme
    cardinalities swap in ``approx_percentile`` (no longer oracle-able).
    """
    bounds = df.agg(
        F.percentile(value_col, F.array(*[F.lit(p) for p in probs])).alias("__bnds")
    )
    tagged = df.join(F.broadcast(bounds))
    bucket = F.aggregate(
        F.col("__bnds"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(value_col) >= b, 1).otherwise(0),
    )
    return tagged.withColumn(bucket_col, bucket).drop("__bnds")
