"""Model-boundary parity: fit a real classifier on assembled features,
score it distributed, ensemble-average — the reference's end state.

The reference's MLPipelineBenchmark finishes with an ensemble of
classifiers averaged over ``predict_proba(x)[:, 1]``
(/root/reference/benchmarks/MLPipelineBenchmark.py:96-98,122-127); its
ONNX path splices the fitted model graph onto the preprocessing graph
(/root/reference/dfpipeline/OnnxGraph.py:119-136).  The Spark-first
analog keeps the same split production systems use:

* **fit** happens driver-side on a (bounded) collected feature matrix —
  the single-node-model wrap tier, same contract as ``WrapTransformer``;
* **score** happens distributed via ``features.score_with`` — the model
  parameters ride the closure into an Arrow-batched pandas UDF, so a
  100 TB scoring pass is a map-only job with no driver round-trip.

sklearn is not available in this container, so the classifier is a
small, deterministic full-batch gradient-descent logistic regression in
pure numpy with the sklearn ``fit`` / ``predict_proba`` surface — any
object with that surface (sklearn, xgboost, ...) drops into
``ensemble_proba_fn`` unchanged.

Because scoring is elementwise per row (a matrix-vector product and a
sigmoid), the distributed Arrow-batched result matches driver-side
scoring of the same matrix to 1 ulp (BLAS summation order varies with
batch size) — asserted in ``tests/test_models.py``.
"""

from __future__ import annotations

import numpy as np

from .base import cheap_row_count


class NumpyLogisticRegression:
    """Binary logistic regression, sklearn-surface (`fit`,
    `predict_proba`, `predict`), deterministic: full-batch gradient
    descent, zero init, fixed iteration count — no RNG anywhere."""

    def __init__(self, lr: float = 0.1, n_iter: int = 200, l2: float = 0.0):
        self.lr = lr
        self.n_iter = n_iter
        self.l2 = l2
        self.coef_ = None
        self.intercept_ = 0.0

    @staticmethod
    def _sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, k = X.shape
        w = np.zeros(k, dtype=np.float64)
        b = 0.0
        for _ in range(self.n_iter):
            p = self._sigmoid(X @ w + b)
            g = p - y
            w -= self.lr * ((X.T @ g) / n + self.l2 * w)
            b -= self.lr * float(g.mean())
        self.coef_ = w
        self.intercept_ = b
        return self

    def predict_proba(self, X):
        X = np.asarray(X, dtype=np.float64)
        p1 = self._sigmoid(X @ self.coef_ + self.intercept_)
        return np.column_stack([1.0 - p1, p1])

    def predict(self, X):
        return (self.predict_proba(X)[:, 1] >= 0.5).astype(np.int64)


class NumpyGradientBoostedStumps:
    """Gradient-boosted depth-1 trees (stumps) on logistic loss — a
    real GBM with the sklearn ``fit`` / ``predict_proba`` / ``predict``
    surface, pure deterministic numpy (no RNG, no library deps).

    Proves the model-boundary contract with the reference's actual
    model family: the reference trains/splices XGBoost-style boosted
    trees (/root/reference/benchmarks/MLPipelineBenchmark.py:96-127,
    /root/reference/dfpipeline/OnnxGraph.py:119-136); this is the
    same additive-trees-on-logit functional form, so pushing it
    through ``ensemble_proba_fn`` + ``features.score_with`` exercises
    exactly the driver-fit / Arrow-batched-distributed-score boundary
    an xgboost/lightgbm model would cross in a full container.

    Standard Friedman GBM: raw score F starts at the log-odds prior;
    each round fits a stump to the negative gradient (y - p) choosing
    the (feature, threshold) split with the best squared-error gain
    over per-feature quantile candidates, then takes a Newton leaf
    step  sum(g) / sum(p*(1-p))  per side.  Deterministic: quantile
    candidates, first-occurrence argmax tie-break, no sampling.
    """

    def __init__(self, n_rounds: int = 30, lr: float = 0.3,
                 n_candidates: int = 31):
        self.n_rounds = n_rounds
        self.lr = lr
        self.n_candidates = n_candidates
        self.stumps_ = None      # list[(feat, threshold, left_val, right_val)]
        self.f0_ = 0.0

    @staticmethod
    def _sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, k = X.shape
        prior = min(max(y.mean(), 1e-6), 1 - 1e-6)
        self.f0_ = float(np.log(prior / (1.0 - prior)))
        raw = np.full(n, self.f0_)
        # per-feature candidate thresholds: interior quantiles (exclude
        # 0/1 so every split is non-trivial), computed once
        qs = np.linspace(0, 1, self.n_candidates + 2)[1:-1]
        cands = [np.unique(np.quantile(X[:, j], qs)) for j in range(k)]
        self.stumps_ = []
        for _ in range(self.n_rounds):
            p = self._sigmoid(raw)
            g = y - p                       # negative gradient of log-loss
            h = p * (1.0 - p)               # hessian
            best = None                     # (gain, j, thr)
            for j in range(k):
                cj = cands[j]
                if not len(cj):
                    continue
                # (n, c) split masks → vectorized left/right residual sums
                left = X[:, j][:, None] <= cj[None, :]
                gl = g @ left
                nl = left.sum(axis=0)
                gr = g.sum() - gl
                nr = n - nl
                ok = (nl > 0) & (nr > 0)
                # squared-error gain of the two-mean fit to the residuals
                gain = np.where(ok, gl * gl / np.maximum(nl, 1)
                                + gr * gr / np.maximum(nr, 1), -np.inf)
                i = int(gain.argmax())
                if best is None or gain[i] > best[0]:
                    best = (float(gain[i]), j, float(cj[i]))
            if best is None or not np.isfinite(best[0]):
                break
            _, j, thr = best
            mask = X[:, j] <= thr
            hl = float(h[mask].sum())
            hr = float(h[~mask].sum())
            lv = float(g[mask].sum()) / hl if hl > 0 else 0.0
            rv = float(g[~mask].sum()) / hr if hr > 0 else 0.0
            self.stumps_.append((j, thr, lv, rv))
            raw = raw + self.lr * np.where(mask, lv, rv)
        return self

    def _raw(self, X):
        X = np.asarray(X, dtype=np.float64)
        raw = np.full(len(X), self.f0_)
        for j, thr, lv, rv in self.stumps_:
            raw += self.lr * np.where(X[:, j] <= thr, lv, rv)
        return raw

    def predict_proba(self, X):
        p1 = self._sigmoid(self._raw(X))
        return np.column_stack([1.0 - p1, p1])

    def predict(self, X):
        return (self.predict_proba(X)[:, 1] >= 0.5).astype(np.int64)


def ensemble_proba_fn(models):
    """``predict_fn`` for :func:`features.score_with`: the mean positive-
    class probability across an ensemble — exactly the reference's
    ``preds += clf.predict_proba(x)[:, 1]; preds /= len(clfs)`` loop
    (MLPipelineBenchmark.py:122-127), vectorized per Arrow batch."""
    def _fn(X):
        preds = np.zeros(len(X), dtype=np.float64)
        for m in models:
            preds += m.predict_proba(X)[:, 1]
        return preds / len(models)
    return _fn


def collect_training_matrix(df, feature_cols, label_col,
                            max_rows: int = 100_000, id_col: str | None = None):
    """Driver-side (X, y) for the fit step — the wrap-tier boundary.
    Deterministically bounded: takes the md5-mod sample when the frame
    exceeds ``max_rows``.  The sample keys on ``id_col`` when one is
    given — keying on concatenated feature values would keep or drop
    all duplicates of a feature row together, skewing the sample — and
    a TakeOrdered ``limit`` after the filter makes the bound hard, not
    just in-expectation (the md5-mod filter only bounds the *expected*
    row count)."""
    from pyspark.sql import functions as F

    key = (F.col(id_col).cast("string") if id_col is not None
           else F.concat_ws(",", *[F.col(c).cast("string")
                                   for c in feature_cols]))
    sel = df.select(F.md5(key).alias("__k"),
                    *[F.col(c).cast("double") for c in feature_cols],
                    F.col(label_col).cast("double").alias("__y"))
    # Footer-metadata cardinality when the frame is a scan (no job); the
    # hard limit() below keeps the collect bounded even if an estimate
    # on a filtered scan over-counts (the safe direction).
    n = cheap_row_count(sel)
    if n > max_rows:
        mod = -(-n // max_rows)
        sel = (sel.filter(
            F.conv(F.substring("__k", 1, 8), 16, 10).cast("long") % mod == 0)
            .orderBy("__k").limit(max_rows))
    pdf = sel.toPandas()
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    y = pdf["__y"].to_numpy(dtype=np.float64)
    return X, y
