"""Engine-wide column expression helpers.

The load-bearing primitive here is :func:`md5_bucket` / :func:`md5_int`:
a *cross-engine deterministic* hash. Spark and DuckDB both implement
standard MD5 over UTF-8 bytes, so an operator whose randomness is derived
from ``md5(key)`` produces bit-identical choices in both engines — which is
what makes hash-sampling, stratified sampling, and histogram bucketing
verifiable against a DuckDB oracle, and reproducible across cluster reruns
(unlike ``rand()``, whose draw depends on partitioning).

The reference uses ``crc32(cast(col as string)) % max_bins`` for the same
purpose (``sparktools/datadiff.py:5``); md5 keeps the semantics (stable
content hash → bucket) with a stronger, engine-portable hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "md5_hex8",
    "md5_int",
    "md5_int60",
    "md5_bucket",
    "md5_unit",
    "cosine_similarity",
    "greedy_subword_count",
    "dot_product",
    "l2_norm",
    "holt_linear_fold",
]

# 2^32 — md5_int yields a uniform draw in [0, 2^32).
_HASH_SPACE = float(1 << 32)


def md5_hex8(col: Column | str) -> Column:
    """First 8 hex chars of md5(string(col)) — portable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, 8)


def md5_int(col: Column | str) -> Column:
    """Deterministic uniform bigint in [0, 2^32) derived from the value.

    DuckDB equivalent: ``('0x' || substr(md5(CAST(x AS VARCHAR)),1,8))::BIGINT``.
    """
    return F.conv(md5_hex8(col), 16, 10).cast("bigint")


def md5_int60(col: Column | str) -> Column:
    """Deterministic uniform bigint in [0, 2^60) — 15 md5 hex chars.

    The wide variant for hashes whose individual BITS carry meaning
    (SimHash votes): 60 bits keeps the value, and any sum of distinct
    bit powers, inside signed-bigint range on both engines.
    DuckDB equivalent: ``('0x' || substr(md5(CAST(x AS VARCHAR)),1,15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def md5_bucket(col: Column | str, n_buckets: int) -> Column:
    """Stable content-hash bucket in [0, n_buckets)."""
    return F.pmod(md5_int(col), F.lit(n_buckets)).cast("bigint")


def md5_unit(col: Column | str) -> Column:
    """Deterministic uniform double in [0, 1) derived from the value.

    The engine's replacement for seeded ``rand()``: reproducible across
    reruns, partitionings, and engines. Used by hash-sampling (the
    reference's seeded Bernoulli sample, ``sparktools/core.py:162-163``).
    """
    return md5_int(col) / F.lit(_HASH_SPACE)


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, JVM-side.

    ``zip_with`` + ``aggregate`` stay inside Catalyst (no Python), fold
    left-to-right in doubles — deterministic accumulation order.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column, JVM-side."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns, JVM-side.

    A zero-norm vector (all-zero padding / corrupt row) yields NULL
    rather than aborting the job with DIVIDE_BY_ZERO under the
    session's ANSI mode; NULL similarity then fails any `>= threshold`
    filter, so zero vectors silently drop out of top-k / near-dup
    candidate sets (DuckDB's `list_cosine_similarity` NaN behaves the
    same way in comparisons).
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)


def greedy_subword_count(col_name: str, vocab: list[str]) -> Column:
    """Number of pieces a greedy longest-match subword encode (the
    WordPiece matching rule: try 4, then 3, then 2 chars, else a single
    character) produces for the string column ``col_name``, given a
    vocabulary of multi-char pieces (2–4 chars each; single characters
    are implicitly always in-vocab).

    Pure Catalyst: a sequential `aggregate` left-fold over character
    positions with the vocabulary embedded as a literal array — no UDF,
    no shuffle, safe inside whole-stage codegen. The fold carries
    (next-unconsumed-position, piece-count); positions already covered
    by a previous match are skipped. Empty strings count as 0 pieces.
    `queries.tokenizer_fertility_documents` replays the identical walk
    as a DuckDB recursive CTE for cross-engine verification.
    """
    for p in vocab:
        if not (2 <= len(p) <= 4):
            raise ValueError(f"vocab pieces must be 2-4 chars, got {p!r}")
    # Spark SQL literals process backslash escapes (escapedStringLiterals
    # is false by default), so '\' must be doubled BEFORE quote-doubling or
    # a piece containing a backslash silently encodes the wrong string and
    # a piece ending in '\' escapes the closing quote and fails to parse.
    def _lit(p: str) -> str:
        return "'" + p.replace("\\", "\\\\").replace("'", "''") + "'"

    vocab_sql = (
        "array(" + ", ".join(_lit(p) for p in vocab) + ")" if vocab else "array('')"
    )
    c = col_name

    def piece(pos: str) -> str:
        return (
            f"CASE WHEN length(substring({c}, {pos}, 4)) = 4"
            f" AND array_contains({vocab_sql}, substring({c}, {pos}, 4)) THEN 4"
            f" WHEN length(substring({c}, {pos}, 3)) = 3"
            f" AND array_contains({vocab_sql}, substring({c}, {pos}, 3)) THEN 3"
            f" WHEN length(substring({c}, {pos}, 2)) = 2"
            f" AND array_contains({vocab_sql}, substring({c}, {pos}, 2)) THEN 2"
            f" ELSE 1 END"
        )

    # guard: Spark's sequence(1, 0) is DESCENDING ([1, 0]), so an empty
    # string would otherwise run one fold step and count 1 piece
    return F.expr(
        f"IF(length({c}) = 0, 0,"
        f" aggregate(sequence(1, length({c})),"
        " named_struct('p', 1, 'n', 0),"
        " (acc, i) -> IF(i != acc.p, acc,"
        f" named_struct('p', acc.p + {piece('acc.p')}, 'n', acc.n + 1))).n)"
    )


def holt_linear_fold(
    col_name: str, alpha: float = 0.5, beta: float = 0.3
) -> Column:
    """Holt's linear-trend exponential smoothing over a SORTED
    ``array<double>`` series column, as a pure Catalyst ``aggregate``
    fold (no UDF, no shuffle): returns ``struct(l, b, e)`` — the final
    level, final trend, and the accumulated one-step absolute error
    over positions 3..n. Textbook init after two observations:
    l = y2, b = y2 - y1; the caller must guarantee ``size >= 2``
    (filter first — ``slice`` with a negative length errors).

    Recurrence per subsequent observation y:
        e += |l + b - y|
        l' = alpha*y + (1-alpha)*(l + b)
        b' = beta*(l' - l) + (1-beta)*b
    The same recurrence replays as a DuckDB recursive CTE in
    ``queries.holt_linear_forecast_user_value``'s oracle and as plain
    Python in tests — three implementations, hash- and property-checked.
    """
    a, ba = alpha, 1 - alpha
    g, bg = beta, 1 - beta
    v = col_name
    return F.expr(
        f"""aggregate(
             slice({v}, 3, size({v}) - 2),
             named_struct('l', CAST({v}[1] AS DOUBLE),
                          'b', CAST({v}[1] - {v}[0] AS DOUBLE),
                          'e', CAST(0.0 AS DOUBLE)),
             (acc, y) -> named_struct(
               'l', {a} * y + {ba} * (acc.l + acc.b),
               'b', {g} * ({a} * y + {ba} * (acc.l + acc.b) - acc.l)
                    + {bg} * acc.b,
               'e', acc.e + abs(acc.l + acc.b - y)))"""
    )
