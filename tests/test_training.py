"""Trainer verb: collect→fit→persist→reload→score round-trip
(reference sparktools/trainer.py flow, SURVEY.md §3.3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_pipeline_spark.models import OLSModel
from spark_pipeline_spark.operators.columns import require_key
from spark_pipeline_spark.operators.scoring import score
from spark_pipeline_spark.operators.training import (
    collect_training_frame,
    load_model,
    save_model,
    train,
)
from spark_pipeline_spark.queries import t
from tests.conftest import SF_SMALL


def _base(spark):
    return (
        t(spark, SF_SMALL, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            F.col("l_orderkey").alias("uid"), "l_quantity", "l_extendedprice"
        )
    )


def test_train_persist_reload_score_roundtrip(spark, tmp_path):
    base = _base(spark)
    path = str(tmp_path / "ols.model")
    model = train(
        base.select("l_quantity", "l_extendedprice"),
        target_col="l_extendedprice",
        new_model=lambda: OLSModel(["l_quantity"]),
        model_path=path,
    )
    reloaded = load_model(path)
    assert reloaded.feature_cols == ["l_quantity"]
    assert np.allclose(reloaded.coef_, model.coef_)
    assert reloaded.intercept_ == model.intercept_

    # distributed scoring with the reloaded model == driver-side predict
    scored = (
        score(require_key(base, "uid"), reloaded, cols_to_save=["uid"])
        .toPandas()
        .sort_values("uid", ignore_index=True)
    )
    pdf = base.toPandas()
    pdf["uid"] = pdf["uid"].astype(str)
    pdf["expected"] = model.predict(pdf)
    pdf = pdf.sort_values("uid", ignore_index=True)
    assert np.allclose(scored["pred"].to_numpy(), pdf["expected"].to_numpy())


def test_collect_training_frame_drops_allnull_and_splits(spark):
    base = _base(spark).withColumn("all_null", F.lit(None).cast("double"))
    x, y = collect_training_frame(base, target_col="l_extendedprice")
    assert "all_null" not in x.columns  # trainer.py:50 parity
    assert "l_extendedprice" not in x.columns
    assert len(x) == len(y) > 0


def test_collect_training_frame_max_rows_guard(spark):
    base = _base(spark)
    with pytest.raises(ValueError, match="max_rows"):
        collect_training_frame(base, target_col="l_extendedprice", max_rows=10)


def test_save_model_pickle_fallback(tmp_path):
    m = OLSModel(["f1"])
    import pandas as pd

    m.fit(pd.DataFrame({"f1": [1.0, 2.0, 3.0]}), pd.Series([2.0, 4.0, 6.0]))
    p = str(tmp_path / "m.bin")
    save_model(m, p)
    r = load_model(p)
    assert np.allclose(r.predict(pd.DataFrame({"f1": [4.0]})), [8.0])
