"""Distributed batch model inference (scorer parity).

The heart of the reference (SURVEY.md §2.10): apply a pickled sklearn-style
Python model to a big DataFrame. The reference ships two paths —

- ``score``: ``rdd.mapPartitions`` + hand-rolled 10k-row batching + a JSON
  round-trip + inferred ``toDF()`` (``sparktools/core.py:87-118``) — loses
  dtypes, defeats column pruning, row-at-a-time serialization;
- ``score_udf``: ``mapInPandas`` with an explicit DDL schema
  (``sparktools/core.py:30-44``) — the modern form.

This engine keeps ONLY the Arrow path. Batching is Arrow's
(``spark.sql.execution.arrow.maxRecordsPerBatch`` supersedes
``block_iterator``, ``core.py:76-84``); the output schema is explicit, so
nothing is inferred; the model rides to executors inside the serialized
closure of the UDF (broadcast join of reference ``core.py:93-97``
semantics — use ``spark.sparkContext.broadcast`` explicitly for very large
models via ``broadcast_model=True``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def predict(
    features_df: pd.DataFrame,
    mdl: Any,
    target_class_names: list[str] | None = None,
    cols_to_save: list[str] | None = None,
) -> pd.DataFrame:
    """The pandas scoring kernel — duck-typed model dispatch.

    Parity with ``sparktools/core.py:47-73``:

    - classifier (has ``predict_proba``): binary → positive-class column
      ``target_proba``; ≥3 classes → one float column per class name
      (auto ``class{i}`` when names absent);
    - regressor (has ``predict``): → ``pred``;
    - plain callable: ``mdl(features_df)`` → ``pred``;
    - passthrough of ``cols_to_save ∩ columns``.
    """
    saved = [c for c in (cols_to_save or []) if c in features_df.columns]
    out = features_df[saved].copy() if saved else pd.DataFrame(index=features_df.index)

    if hasattr(mdl, "predict_proba"):
        proba = mdl.predict_proba(features_df)
        n_classes = proba.shape[1]
        if n_classes <= 2:
            out["target_proba"] = proba[:, -1].astype("float64")
        else:
            names = target_class_names or [f"class{i}" for i in range(n_classes)]
            for i, name in enumerate(names):
                out[name] = proba[:, i].astype("float64")
    elif hasattr(mdl, "predict"):
        out["pred"] = pd.Series(mdl.predict(features_df), index=features_df.index).astype(
            "float64"
        )
    elif callable(mdl):
        out["pred"] = pd.Series(mdl(features_df), index=features_df.index).astype("float64")
    else:
        raise TypeError(f"model {type(mdl)!r} has no predict_proba/predict and is not callable")
    return out


def _output_schema(
    df: DataFrame,
    mdl: Any,
    target_class_names: list[str] | None,
    cols_to_save: list[str] | None,
) -> str:
    """Explicit output DDL (``sparktools/core.py:31-36`` approach) — nothing
    schema-inferred, so floats stay floats and nulls stay typed.

    The class count is never guessed: a ``predict_proba`` model must carry
    ``classes_`` or the caller must pass ``target_class_names`` — otherwise
    the declared schema could disagree with the runtime batch width, which
    would only surface as an Arrow error deep inside an executor
    (SURVEY.md §2.13.9 — the schema-inference class of bug this engine
    rejects).
    """
    saved = [c for c in (cols_to_save or []) if c in df.columns]
    parts = [f"`{name}` {dtype}" for name, dtype in df.select(*saved).dtypes] if saved else []
    if hasattr(mdl, "predict_proba"):
        if target_class_names is not None:
            n_classes = len(target_class_names)
        elif hasattr(mdl, "classes_"):
            n_classes = len(mdl.classes_)
        else:
            raise ValueError(
                "model has predict_proba but no classes_ attribute; pass "
                "target_class_names so the output schema is explicit "
                "(binary models: pass ['neg','pos'] or expose classes_)"
            )
        if n_classes <= 2:
            parts.append("target_proba double")
        else:
            names = target_class_names or [f"class{i}" for i in range(n_classes)]
            parts.extend(f"`{n}` double" for n in names)
    else:
        parts.append("pred double")
    return ", ".join(parts)


def score(
    df: DataFrame,
    mdl: Any,
    cols_to_save: list[str] | None = None,
    target_class_names: list[str] | None = None,
    feature_cols: list[str] | None = None,
    broadcast_model: bool = False,
) -> DataFrame:
    """Distributed inference: DataFrame → DataFrame with prediction columns.

    Single implementation replacing both reference paths (``score`` /
    ``score_udf``, SURVEY.md §2.10 U1/U2). ``feature_cols`` optionally
    projects the input first — at 100 TB, not selecting the 5 feature
    columns out of 500 is the difference between reading 1 TB and 100 TB
    (column pruning reaches the parquet scan because this stays a
    DataFrame plan).
    """
    if feature_cols:
        keep = list(dict.fromkeys((cols_to_save or []) + feature_cols))
        df = df.select(*[c for c in keep if c in df.columns])

    schema = _output_schema(df, mdl, target_class_names, cols_to_save)

    if broadcast_model:
        bc = df.sparkSession.sparkContext.broadcast(mdl)

        def get_model() -> Any:
            return bc.value

    else:

        def get_model() -> Any:
            return mdl

    saved, names = cols_to_save, target_class_names

    def apply_model(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = get_model()
        for batch in batches:
            yield predict(batch, model, target_class_names=names, cols_to_save=saved)

    return df.mapInPandas(apply_model, schema=schema)


# Back-compat alias: the reference exposes the Arrow path as `score_udf`
# (`sparktools/core.py:30`).
score_udf = score
