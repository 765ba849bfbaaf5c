"""Distributed text classifier — fasttext-style hashed bag-of-words
logistic regression, TRAINED IN SPARK (full-batch gradient descent as a
driver loop of small aggregate jobs, the same shape as the BPE trainer
and PageRank), scored as pure codegen.

Why this exists: the quality/language classifiers an LLM data pipeline
gates on are linear models over hashed token features.  The package's
``models.py`` tier covers the wrap-a-single-node-model boundary; this
module is the DISTRIBUTED-fit complement — no driver-side feature
matrix ever materializes, so the training corpus can be 100 TB.

Determinism (the property that makes it verifiable):

* token → feature index is the md5-derived ``h32 % n_features`` used
  across the dedup/text tiers — bit-replayable in DuckDB.
* per-document gradients are quantized to 9 dp and summed as exact
  DECIMAL, so the per-feature gradient is independent of partitioning
  and reduction order: ``fit`` on any repartitioning yields
  BIT-IDENTICAL weights (tested), and the scoring oracle can replay
  the fitted weights as literals.

Scale shape per iteration: ONE pass over the persisted (label,
index-array) frame computing each doc's margin with an
``aggregate`` HOF over the weight array (map-only), then ONE
explode→groupBy shuffle whose output is at most ``n_features`` rows.
Up to ``WEIGHT_LITERAL_MAX`` (64k) features the weight array is a
single SQL literal string (one driver call, not n_features Column
objects — see the expectations.py profiling note); above that it is a
broadcast 1-row frame, so plan size and analysis time stay O(1) in
n_features at fasttext-scale (2M-bucket) vocabularies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Up to this many features the weight vector rides as ONE SQL array
#: literal — inside whole-stage codegen, zero extra plan nodes, the
#: right call at the default 1024.  Above it the SQL text and analysis
#: time grow O(n_features) per iteration (a fasttext-style 2M-bucket
#: vocabulary would be a ~40 MB expression), so the weights ship as a
#: broadcast 1-row frame instead (see ``_with_weights``).
WEIGHT_LITERAL_MAX = 65_536


class HashedTextClassifier:
    """Binary logistic regression over hashed token counts.

    ``fit`` runs ``n_iter`` full-batch GD steps (zero init, fixed
    iteration count, no RNG); ``transform`` appends the positive-class
    probability.  Unseen tokens at scoring time hash into the same
    fixed table — there is no out-of-vocabulary path, the fasttext
    trade."""

    def __init__(self, n_features: int = 1024, lr: float = 0.05,
                 n_iter: int = 15):
        if n_features < 2:
            raise ValueError("n_features must be >= 2")
        self.n_features = int(n_features)
        self.lr = float(lr)
        self.n_iter = int(n_iter)
        self.w_: list[float] | None = None
        self.b_: float = 0.0

    # -- shared expressions ------------------------------------------
    def _idx_array(self, text_col: str):
        toks = F.filter(F.split(F.col(text_col), r"\s+"),
                        lambda t: t != "")
        return F.transform(
            toks,
            lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                       .cast("long") % self.n_features).cast("int"))

    def _w_expr(self, w):
        vals = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in w)
        return F.expr(f"array({vals})")

    def _with_weights(self, df: DataFrame, w):
        """(frame, weight-array Column, joined?): below
        ``WEIGHT_LITERAL_MAX`` features the weights are a single SQL
        array literal; above it they ride as a BROADCAST 1-row frame
        cross-joined in (BroadcastNestedLoopJoin with a 1-row build
        side — the whitelisted literal-side shape), so the plan text
        stays O(1) in n_features and analysis time doesn't blow up at
        fasttext-scale vocabularies.  Both paths evaluate the identical
        element_at arithmetic, so fitted weights are bit-identical."""
        if self.n_features <= WEIGHT_LITERAL_MAX:
            return df, self._w_expr(w), False
        schema = T.StructType([T.StructField(
            "__dfp_w", T.ArrayType(T.DoubleType(), False), False)])
        wdf = df.sparkSession.createDataFrame(
            [([float(x) for x in w],)], schema)
        return df.crossJoin(F.broadcast(wdf)), F.col("__dfp_w"), True

    def _margin(self, idx_col, warr, b: float):
        """Raw-count bag margin: z = b + Σ_tokens w[idx].  The margin
        scale grows with document length, so the DEFAULT lr is sized
        for full-batch GD stability at typical lengths (lr must be
        below ~2/L with L ≈ mean ||x||²; divergence shows up as
        saturated probabilities oscillating between classes)."""
        return F.aggregate(idx_col, F.lit(float(b)),
                           lambda acc, i: acc + F.element_at(warr, i + 1))

    # -- training ----------------------------------------------------
    def fit(self, df: DataFrame, text_col: str = "text",
            label_col: str = "y") -> "HashedTextClassifier":
        feats = (df.select(F.col(label_col).cast("double").alias("__y"),
                           self._idx_array(text_col).alias("__idx"))
                 .filter(F.size("__idx") > 0)   # empty docs have no margin
                 .persist())
        n = feats.count()
        if n == 0:
            raise ValueError("fit on an empty frame")
        w = [0.0] * self.n_features
        b = 0.0
        for _ in range(self.n_iter):
            base, warr, _joined = self._with_weights(feats, w)
            z = self._margin(F.col("__idx"), warr, b)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            # 9-dp quantized gradients, decimal-summed: the totals
            # cannot move with partitioning or reduction order.  The
            # bias sees the raw per-doc gradient; each feature sees
            # g/len per token instance (the derivative of the
            # L1-normalized margin).
            g = p - F.col("__y")
            scored = base.select(
                F.round(g, 9).alias("__g"), "__idx")
            gb = scored.agg(
                F.sum(F.col("__g").cast("decimal(28,9)")).alias("s")
            ).collect()[0]["s"]
            rows = (scored.select(F.explode("__idx").alias("__i"),
                                  "__g")
                    .groupBy("__i")
                    .agg(F.sum(F.col("__g").cast("decimal(28,9)"))
                         .alias("s"))
                    .collect())
            b -= self.lr * float(gb) / n
            for r in rows:
                w[r["__i"]] -= self.lr * float(r["s"]) / n
        feats.unpersist()
        self.w_, self.b_ = w, b
        return self

    # -- scoring -----------------------------------------------------
    def transform(self, df: DataFrame, text_col: str = "text",
                  out: str = "p_pos") -> DataFrame:
        if self.w_ is None:
            raise RuntimeError("HashedTextClassifier.transform before fit")
        base, warr, joined = self._with_weights(df, self.w_)
        z = self._margin(self._idx_array(text_col), warr, self.b_)
        scored = base.withColumn(
            out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        return scored.drop("__dfp_w") if joined else scored

    def fit_transform(self, df: DataFrame, text_col: str = "text",
                      label_col: str = "y",
                      out: str = "p_pos") -> DataFrame:
        return self.fit(df, text_col, label_col).transform(
            df, text_col, out)
