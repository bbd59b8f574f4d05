"""Model protocol + test models.

The engine scores any *duck-typed* sklearn-style object (SURVEY.md §2.10
U3 dispatch): ``predict_proba`` → classifier, ``predict`` → regressor,
plain callable → generic. sklearn itself is optional — these numpy-only
models exercise every dispatch branch deterministically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def simple_model(x: pd.DataFrame) -> pd.Series:
    """Toy callable model: product of two feature columns.

    Parity with the reference test fixture (``sparktools/simple_model.py:
    1-2``: ``x.f1 * x.f2``), generalized to named columns.
    """
    return x["f1"] * x["f2"]


class LinearModel:
    """Deterministic regressor: dot(features, coef) + intercept."""

    def __init__(self, coef: dict[str, float], intercept: float = 0.0) -> None:
        self.coef = dict(coef)
        self.intercept = float(intercept)

    def predict(self, x: pd.DataFrame) -> np.ndarray:
        out = np.full(len(x), self.intercept, dtype="float64")
        for c, w in self.coef.items():
            out += w * x[c].to_numpy(dtype="float64")
        return out


class LogisticModel:
    """Deterministic binary classifier: sigmoid of a linear score."""

    def __init__(self, coef: dict[str, float], intercept: float = 0.0) -> None:
        self.linear = LinearModel(coef, intercept)
        self.classes_ = np.array([0, 1])

    def predict_proba(self, x: pd.DataFrame) -> np.ndarray:
        z = self.linear.predict(x)
        p1 = 1.0 / (1.0 + np.exp(-z))
        return np.column_stack([1.0 - p1, p1])

    def predict(self, x: pd.DataFrame) -> np.ndarray:
        return (self.predict_proba(x)[:, 1] >= 0.5).astype("int64")


class MulticlassModel:
    """Deterministic softmax classifier over per-class linear scores."""

    def __init__(self, class_coefs: dict[str, dict[str, float]]) -> None:
        self.class_names = list(class_coefs)
        self.models = {k: LinearModel(v) for k, v in class_coefs.items()}
        self.classes_ = np.arange(len(self.class_names))

    def predict_proba(self, x: pd.DataFrame) -> np.ndarray:
        scores = np.column_stack([self.models[k].predict(x) for k in self.class_names])
        scores -= scores.max(axis=1, keepdims=True)
        e = np.exp(scores)
        return e / e.sum(axis=1, keepdims=True)
