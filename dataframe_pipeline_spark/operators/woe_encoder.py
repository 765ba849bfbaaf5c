"""WOEEncoder — weight-of-evidence categorical encoding.

The credit-scoring / risk-modeling encoder: each category becomes the
log-odds of the binary target within it, relative to the global odds —

    woe(c) = ln( (pos_c + a) / (pos_total + 2a)
               / ((neg_c + a) / (neg_total + 2a)) )

with additive smoothing ``a`` (Laplace) so rare categories shrink
toward 0 instead of exploding to ±inf.  Positive WOE = the category
over-indexes on the positive class.

Spark-first: fit is ONE global aggregate (two scalars) plus ONE
groupBy per input column producing a (category → woe) lookup whose
arithmetic runs inside the aggregate plan (no driver math beyond the
two scalars); transform is a size-gated broadcast left join per
column, unseen/NULL categories → 0.0 (no evidence).  Same lookup
discipline as TargetEncoder / FrequencyEncoder; the serving tier's
literal-map compiler handles it via ``_serve_woe_encoder`` (registered
in ``serving._SERVING_COMPILERS``), so a WOE-containing pipeline keeps
the job-free LocalRelation fold online.

Reference parity: the reference has no WOE surface; this extends the
encoder family the same way TargetEncoder does (beyond-reference,
driver-requested training-pipeline tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import SparkDFPBase, nan_to_null

BROADCAST_MAX_ROWS = 500_000


class WOEEncoder(SparkDFPBase):
    def __init__(self, inputs=None, outputs=None, target: str = None,
                 alpha: float = 0.5):
        if not target:
            raise ValueError("target column is required")
        if alpha < 0:
            raise ValueError("alpha must be >= 0")
        self.inputs = list(inputs or [])
        self.outputs = list(outputs or [])
        self.target = target
        self.alpha = float(alpha)
        self.lookups_ = []      # per input: DataFrame(__cat, __woe)
        self.cards_ = []        # per input: fitted category count
        self.totals_ = None     # (pos_total, neg_total)

    def fit(self, df: DataFrame, **params):
        y = F.col(self.target).cast("double")
        a = F.lit(self.alpha)
        self.lookups_, self.cards_ = [], []
        if not self.inputs:
            row = df.agg(F.sum(y).alias("p"),
                         F.count(y).alias("n")).collect()[0]
            pos_t = float(row["p"] or 0.0)
            self.totals_ = (pos_t, float(row["n"]) - pos_t)
            return self
        for i, c in enumerate(self.inputs):
            # ONE scan per column (same device as TargetEncoder.fit):
            # NULL/NaN categories stay in the grouped aggregate so the
            # global totals re-sum from the materialized tiny frame,
            # and the count()/transform joins read the checkpoint
            # instead of re-scanning the training data.
            stats = (df.groupBy(nan_to_null(df, c).alias("__cat"))
                     .agg(F.sum(y).alias("__pos"), F.count(y).alias("__n"))
                     .localCheckpoint())
            if i == 0:
                row = stats.agg(F.sum("__pos").alias("p"),
                                F.sum("__n").alias("n")).collect()[0]
                pos_t = float(row["p"] or 0.0)
                self.totals_ = (pos_t, float(row["n"] or 0) - pos_t)
            pos_t, neg_t = self.totals_
            lk = (stats.filter(F.col("__cat").isNotNull())
                  .select(
                      "__cat",
                      F.log(((F.col("__pos") + a)
                             / F.lit(pos_t + 2 * self.alpha))
                            / ((F.col("__n") - F.col("__pos") + a)
                               / F.lit(neg_t + 2 * self.alpha)))
                      .alias("__woe")))
            self.lookups_.append(lk)
            self.cards_.append(lk.count())
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.totals_ is None:
            raise RuntimeError("WOEEncoder.transform before fit")
        out = df
        for c, o, lk, n in zip(self.inputs, self.outputs, self.lookups_,
                               self.cards_):
            lkr = (lk.withColumnRenamed("__cat", f"__cat_{o}")
                     .withColumnRenamed("__woe", f"__woe_{o}"))
            lkb = F.broadcast(lkr) if n <= BROADCAST_MAX_ROWS else lkr
            out = (out.join(lkb,
                            nan_to_null(out, c) == F.col(f"__cat_{o}"),
                            "left")
                   .withColumn(o, F.coalesce(F.col(f"__woe_{o}"),
                                             F.lit(0.0)))
                   .drop(f"__cat_{o}", f"__woe_{o}"))
        return out
