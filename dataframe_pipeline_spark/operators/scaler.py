"""Scaler — minmax / standard / min normalization, exact sklearn parity.

Reference: /root/reference/dfpipeline/Scaler.py — wraps sklearn
MinMaxScaler / StandardScaler, or subtracts the fitted min.

Parity notes (what the sklearn scalers actually compute):
- minmax:    (x - data_min) / (data_max - data_min); zero range → divisor 1
  (sklearn ``_handle_zeros_in_scale``).
- standard:  (x - mean) / std_pop with **population** std (ddof=0); zero
  std → divisor 1.
- min:       x - min.
- robust:    (x - median) / IQR with interpolated quartiles (sklearn
  RobustScaler defaults: centering on the median, scaling by
  Q3 - Q1); zero IQR → divisor 1.  Fit uses exact ``percentile``
  (sort-based) for sklearn/oracle parity — at 100 TB swap in the
  bounded-memory ``approx_percentile`` sketch as OutlierClipper does.
- NaN is ignored when fitting and propagates through transform (our
  arithmetic over NULL-normalized values does the same).

Spark-first: fit runs ONE combined ``df.agg`` over every input column
(single scan, scalars to the driver — a handful of doubles regardless of
data size); transform is pure Column arithmetic folded into codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import SparkDFPBase, nan_to_null


class Scaler(SparkDFPBase):
    #: transform adds/overwrites arithmetic columns; never changes rows
    ROW_PRESERVING = True

    #: strategies whose fit aggregates are exact MULTISET functions
    #: (order- and partition-independent: min/max), safe to compute on
    #: the pipeline's base frame under the fused-fit gate.  mean/stddev
    #: (FP summation order follows the plan's partitioning) and the
    #: percentile tiers (GK/exact refine are partition- or multi-job-
    #: shaped) must keep fitting on the threaded frame.
    _DEFER_SAFE_STRATEGIES = ("minmax", "min")

    def __init__(self, inputs=None, outputs=None, strategy=None,
                 approx: bool = False, accuracy: int = 10000):
        """``approx`` (robust strategy only): fit the quartiles with the
        bounded-memory ``percentile_approx`` sketch instead of the exact
        sort-based ``percentile`` — the 100 TB path.  Rank error is at
        most n/``accuracy`` per quantile (Greenwald-Khanna guarantee);
        sklearn parity keeps the exact default."""
        self.inputs = list(inputs or [])
        self.outputs = list(outputs or [])
        self.strategy = strategy
        if strategy not in ("minmax", "standard", "min", "robust"):
            raise ValueError(f"Not implemented strategy: {strategy!r}")
        self.approx = bool(approx)
        self.accuracy = int(accuracy)
        self.offsets = []  # per input: offset subtracted
        self.scales = []   # per input: multiplier  (1/denominator)

    def fit(self, df: DataFrame, **params):
        self.offsets, self.scales = [], []
        if self.strategy == "robust" and not self.approx:
            # exact tier via bracket-and-refine (base.exact_percentiles):
            # identical values to percentile(), bounded executor memory,
            # ~4x faster at sf1 — the approx tier below stays the
            # single-sketch GK aggregate
            from ..base import exact_percentiles

            res = exact_percentiles(
                df, [nan_to_null(df, c) for c in self.inputs],
                [[0.25, 0.5, 0.75]] * len(self.inputs),
                accuracy=self.accuracy)
            for qs in res:
                md = qs[1]
                iqr = (qs[2] - qs[0]) if (qs[0] is not None
                                          and qs[2] is not None) else None
                scale = 1.0 / iqr if iqr not in (None, 0, 0.0) else 1.0
                self.offsets.append(md)
                self.scales.append(scale)
            return self
        aggs = []
        for i, c in enumerate(self.inputs):
            v = nan_to_null(df, c)
            if self.strategy == "minmax":
                aggs += [F.min(v).alias(f"lo{i}"), F.max(v).alias(f"hi{i}")]
            elif self.strategy == "standard":
                aggs += [F.mean(v).alias(f"mu{i}"), F.stddev_pop(v).alias(f"sd{i}")]
            elif self.strategy == "robust":
                # ONE array-percentile state per column (a single
                # value-count map over the data), not three separate
                # percentile aggregates each building its own — 3x the
                # dominant fit cost at scale (measured on 6M rows)
                qarr = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
                aggs += [F.percentile_approx(v, qarr, F.lit(self.accuracy))
                         .alias(f"qs{i}")]
            else:  # min
                aggs += [F.min(v).alias(f"lo{i}")]
        row = df.agg(*aggs).collect()[0]
        for i in range(len(self.inputs)):
            if self.strategy == "minmax":
                lo, hi = row[f"lo{i}"], row[f"hi{i}"]
                rng = (hi - lo) if (hi is not None and lo is not None) else None
                scale = 1.0 / rng if rng not in (None, 0, 0.0) else 1.0
                self.offsets.append(lo)
                self.scales.append(scale)
            elif self.strategy == "standard":
                mu, sd = row[f"mu{i}"], row[f"sd{i}"]
                scale = 1.0 / sd if sd not in (None, 0, 0.0) else 1.0
                self.offsets.append(mu)
                self.scales.append(scale)
            elif self.strategy == "robust":
                qs = row[f"qs{i}"]
                md = qs[1] if qs is not None else None
                iqr = (qs[2] - qs[0]) if qs is not None else None
                scale = 1.0 / iqr if iqr not in (None, 0, 0.0) else 1.0
                self.offsets.append(md)
                self.scales.append(scale)
            else:
                self.offsets.append(row[f"lo{i}"])
                self.scales.append(None)  # plain subtraction keeps input dtype
        return self

    # -- fused-fit protocol (pipeline.py, VERDICT r12 #2) ------------------
    def _deferred_fit_aggs(self, df: DataFrame, prefix: str):
        """Aggregate Columns for a deferred (base-frame, fused-job) fit,
        or None when this configuration must fit on the threaded frame
        (see _DEFER_SAFE_STRATEGIES)."""
        if self.strategy not in self._DEFER_SAFE_STRATEGIES:
            return None
        aggs = []
        for i, c in enumerate(self.inputs):
            v = nan_to_null(df, c)
            aggs.append(F.min(v).alias(f"{prefix}lo{i}"))
            if self.strategy == "minmax":
                aggs.append(F.max(v).alias(f"{prefix}hi{i}"))
        return aggs

    def _deferred_fit_consume(self, row, prefix: str):
        """Complete the fit from the fused job's row — same arithmetic
        as fit()'s minmax/min branches."""
        from ..base import SERVING_CACHE_ATTR

        self.__dict__.pop(SERVING_CACHE_ATTR, None)
        self.offsets, self.scales = [], []
        for i in range(len(self.inputs)):
            lo = row[f"{prefix}lo{i}"]
            if self.strategy == "minmax":
                hi = row[f"{prefix}hi{i}"]
                rng = (hi - lo) if (hi is not None and lo is not None) else None
                self.offsets.append(lo)
                self.scales.append(1.0 / rng if rng not in (None, 0, 0.0)
                                   else 1.0)
            else:  # min
                self.offsets.append(lo)
                self.scales.append(None)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        updates = {}
        for input, output, off, scale in zip(self.inputs, self.outputs, self.offsets, self.scales):
            col = nan_to_null(df, input)
            if self.strategy == "min":
                updates[output] = col - F.lit(off)
            else:
                updates[output] = (col - F.lit(off)) * F.lit(scale)
        return df.withColumns(updates)
