"""Model-based quality filtering: logistic regression, Spark-first.

Heuristic quality scores (``operators.text.quality_score``) are the
first rung of pretraining-corpus curation; the second is a *trained*
filter (fastText-style classifiers in public pipelines like CCNet /
RedPajama). The Spark-shaped version of that stage:

- **Training is bounded**: a deterministic, id-ordered sample of at
  most ``train_cap`` rows is collected and fit driver-side (the same
  ``train_cap`` discipline as ``train_ivf_centroids`` and the langid
  trainer — the model artifact is O(n_features), the training scan is
  one capped sort+limit, never the corpus).
- **Scoring is a literal expression**: the learned weights embed into
  a ``sigmoid(w.x + b)`` Catalyst expression — a pure narrow map in
  whole-stage codegen, no UDF, no broadcast, no shuffle. At 100 TB
  the scoring pass costs exactly one scan.
- **Deterministic end-to-end**: fixed iteration count, float64
  batch gradient descent (no stochasticity), id-ordered sample —
  identical weights and scores on every run/partitioning, so the
  output is golden-snapshot safe.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    order_col: str | Column,
    train_cap: int = 8192,
    n_iter: int = 300,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> list[float]:
    """Fit logistic regression on a bounded deterministic sample.

    Returns ``[bias, w1, ..., wk]``. Full-batch gradient descent with
    L2 regularization (never on the bias), fixed ``n_iter`` — no RNG,
    no early stopping, so the artifact is reproducible bit-for-bit.
    """
    feats = list(feature_cols)
    # project BEFORE the sort: spelled select-after-orderBy, the
    # feature expressions land in TakeOrderedAndProject's output
    # projection, which Spark applies on the DRIVER single-threaded
    # over every collected row — measured 10.5 s vs ~1 s for this
    # spelling on q_quality_model at sf0.1 (r12, guide §5 driver).
    # Projecting first keeps the (possibly expensive) feature
    # expressions in the distributed scan stage; the take's own
    # projection is then a trivial column selection. Same rows, same
    # order, bit-identical weights.
    order = order_col if isinstance(order_col, Column) else F.col(order_col)
    sample = (
        df.select(order.alias("__ord"), label_col, *feats)
        .orderBy("__ord")
        .limit(train_cap)
        .select(label_col, *feats)
        .collect()
    )
    if not sample:
        raise ValueError("cannot train on an empty input")
    X = np.array([[float(r[c]) for c in feats] for r in sample])
    y = np.array([float(r[label_col]) for r in sample])
    n = len(y)
    w = np.zeros(len(feats))
    b = 0.0
    for _ in range(n_iter):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * ((X.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return [float(b)] + [float(x) for x in w]


def logreg_score(
    df: DataFrame, feature_cols: Sequence[str], weights: Sequence[float]
) -> Column:
    """``sigmoid(bias + w.x)`` as a literal Catalyst expression."""
    bias, *ws = weights
    z = F.lit(bias)
    for c, wi in zip(feature_cols, ws):
        z = z + F.lit(wi) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
