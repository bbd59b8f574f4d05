"""Local re-implementation of the driver's DuckDB-oracle compare.

Mirrors the driver contract (BASELINE.md): row count + schema + order-
insensitive value comparison between a Spark DataFrame and DuckDB running
the oracle SQL on the same parquet tables.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_views(con: Any, sf_dir: str) -> None:
    for tbl in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {tbl} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )


def _dtype_family(s: pd.Series) -> str:
    """Coarse dtype family used for the strict driver-hash-parity check.

    The driver's value hash is dtype-sensitive: a DuckDB HUGEINT that
    pandas materializes as float64 hashes differently from Spark's int64
    even when every value is numerically identical (the r5
    `corpus_prep_end_to_end` failure). We mirror that here at family
    granularity — int32 vs int64 is fine, int vs float is not."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("int64") // 10**9  # epoch seconds
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype("string")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(spark_df: Any, con: Any, sql: str, atol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    Floats are compared BIT-EXACTLY by default (``atol=0.0`` → float64
    bit-pattern equality, both-NaN counts as equal). The driver hashes
    values, so any tolerance here is a class of local-pass/driver-fail
    bugs (r5's ``corpus_prep_end_to_end``); being at least as strict as
    any conceivable hash makes that structurally impossible. Queries
    must therefore produce engine-exact floats — integer-cents sums,
    bit-identical single expressions — not approximately-equal ones."""
    got_raw = spark_df.toPandas()
    want_raw = con.execute(sql).fetchdf()
    got = _normalize(got_raw)
    want = _normalize(want_raw)
    problems: list[str] = []
    if len(got) != len(want):
        problems.append(f"row count: spark={len(got)} duckdb={len(want)}")
    if list(got.columns) != list(want.columns):
        problems.append(f"columns: spark={list(got.columns)} duckdb={list(want.columns)}")
    else:
        for c in sorted(got_raw.columns):
            fa, fb = _dtype_family(got_raw[c]), _dtype_family(want_raw[c])
            if fa != fb:
                problems.append(
                    f"column {c}: dtype family spark={fa}({got_raw[c].dtype}) "
                    f"duckdb={fb}({want_raw[c].dtype}) — driver hash would mismatch"
                )
    if problems:
        return problems
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa = a.astype("float64").to_numpy()
            bb = b.astype("float64").to_numpy()
            if atol == 0.0:
                import numpy as np

                bits_a = aa.view("int64")
                bits_b = bb.view("int64")
                both_nan = np.isnan(aa) & np.isnan(bb)
                neq = ((bits_a != bits_b) & ~both_nan)
                bad = int(neq.sum())
                if bad:
                    ex = [
                        (float(x), float(y))
                        for x, y, m in zip(aa, bb, neq)
                        if m
                    ][:3]
                    problems.append(
                        f"column {c}: {bad}/{len(aa)} float BIT mismatches, "
                        f"e.g. {ex}"
                    )
                continue
            bad = 0
            for x, y in zip(aa, bb):
                both_nan = math.isnan(x) and math.isnan(y)
                if not both_nan and not math.isclose(x, y, rel_tol=0, abs_tol=atol):
                    bad += 1
            if bad:
                problems.append(f"column {c}: {bad}/{len(aa)} float mismatches")
        else:
            neq = (a.fillna("\0") != b.fillna("\0")).sum()
            if neq:
                ex = [
                    (str(x), str(y))
                    for x, y in zip(a.tolist(), b.tolist())
                    if str(x) != str(y)
                ][:3]
                problems.append(f"column {c}: {neq}/{len(a)} mismatches, e.g. {ex}")
    return problems
