"""Base classes and helpers for dataframe_pipeline_spark operators.

The reference framework (IBM/dataframe-pipeline, see
/root/reference/dfpipeline/DFPBase.py:23-53) defines a scikit-learn style
``fit`` / ``transform`` / ``fit_transform`` contract over a single pandas
DataFrame that every transformer mutates in place.  Here the same contract
is re-expressed over immutable PySpark DataFrames: ``transform`` returns a
*new* DataFrame built from declarative Column expressions so Catalyst can
optimize the whole pipeline as one logical plan (column pruning, predicate
pushdown, constant folding come for free).

Fitted state is kept either as small driver-side literals (scalars) or as
*lookup DataFrames* that are joined back at transform time.  At 100 TB
scale a fitted frequency/label map can be far too large for a literal
``F.create_map``; a join (broadcast when small, shuffle otherwise — AQE
picks at runtime) is the scale-safe representation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Sentinel meaning "all columns" (reference: DFPBase.py:25 ``_PARM_ALL``).
PARM_ALL = "__ALL"

#: Attribute the serving tier (serving.py) caches compiled literal maps
#: under.  Declared here so (a) ``fit`` can invalidate it without a
#: circular import and (b) persistence can strip it (the cached values
#: are pyspark Columns — py4j handles, not picklable and stale across
#: sessions anyway).
SERVING_CACHE_ATTR = "_dfp_serving_literals"


class SparkDFPBase:
    """Common base: fit/transform contract + column-list helpers.

    Mirrors the API of ``dfpipeline.DFPBase`` (reference DFPBase.py:23-40)
    without any of its ONNX machinery — Spark's Catalyst plan plays the
    role the ONNX graph played in the reference.
    """

    _PARM_ALL = PARM_ALL

    #: Lineage declaration for the pipeline's fused-fit gate (r13): True
    #: ONLY when ``transform`` provably preserves the input's row
    #: multiset — it may add or overwrite columns but never filters,
    #: explodes, re-aggregates or deduplicates rows.  The pipeline may
    #: then compute a LATER step's order-independent fit aggregates on
    #: the pipeline's BASE frame (fused into one job) instead of the
    #: threaded frame.  Fail-closed: the False default disables fusion
    #: across any step that has not been audited.
    ROW_PRESERVING = False

    def __init_subclass__(cls, **kwargs):
        """Wrap each subclass's ``fit`` so refitting invalidates any
        compiled serving-literal cache: without this, ``fit`` rebuilds
        the lookup state but ``serving_transform`` keeps scoring with
        the OLD literal maps — silent batch/serving divergence."""
        super().__init_subclass__(**kwargs)
        fit = cls.__dict__.get("fit")
        if fit is not None and not getattr(fit, "_dfp_invalidates", False):
            import functools

            @functools.wraps(fit)
            def fit_and_invalidate(self, *args, **kw):
                self.__dict__.pop(SERVING_CACHE_ATTR, None)
                return fit(self, *args, **kw)

            fit_and_invalidate._dfp_invalidates = True
            cls.fit = fit_and_invalidate

    @classmethod
    def replace_PARM_ALL(cls, df: DataFrame, tgt):
        if isinstance(tgt, str) and tgt == PARM_ALL:
            return list(df.columns)
        return tgt

    def fit(self, df: DataFrame, **params) -> "SparkDFPBase":
        """Learn state from ``df``. Default: stateless no-op."""
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def fit_transform(self, df: DataFrame, **params) -> DataFrame:
        return self.fit(df, **params).transform(df)


# ---------------------------------------------------------------------------
# NaN / NULL normalization helpers
#
# The reference conflates NaN and "missing" (pandas semantics).  Spark
# distinguishes SQL NULL from float NaN and — crucially — treats NaN as
# *larger than any number* in comparisons and as a normal value in
# aggregates.  To reproduce pandas semantics every statistic and comparison
# must see NaN as NULL.  These helpers do that normalization once, near the
# scan, so the rest of the plan stays NULL-only.
# ---------------------------------------------------------------------------

_FLOATING = (T.FloatType, T.DoubleType)


def is_floating(dtype: T.DataType) -> bool:
    return isinstance(dtype, _FLOATING)


def is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.NumericType)


def field_type(df: DataFrame, name: str) -> T.DataType:
    return df.schema[name].dataType


def nan_to_null(df: DataFrame, name: str) -> Column:
    """Column expr for ``name`` with float NaN mapped to NULL.

    Non-floating columns pass through untouched (``isnan`` is only defined
    for float/double).
    """
    col = F.col(name)
    if is_floating(field_type(df, name)):
        return F.when(F.isnan(col), F.lit(None)).otherwise(col)
    return col


def stringify(df: DataFrame, name: str) -> Column:
    """Cast a column to string the way ``str(x)`` does in Python.

    pandas ``astype(str)`` renders float NaN as ``'nan'``; Spark's cast
    renders it ``'NaN'`` — normalize to the pandas spelling so string ops
    (concat/split) agree with the reference.
    """
    col = F.col(name)
    dt = field_type(df, name)
    s = col.cast("string")
    if is_floating(dt):
        s = F.when(F.isnan(col), F.lit("nan")).otherwise(s)
    return s


# ---------------------------------------------------------------------------
# Python/NumPy dtype → Spark type mapping
# (reference: DFPBase.py:134-212 maps the same set to ONNX tensor types)
# ---------------------------------------------------------------------------

_NP_TO_SPARK = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # Spark has no unsigned ints; widen like the reference's ONNX mapping.
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.LongType(),
    "float16": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float128": T.DoubleType(),
    "bool": T.BooleanType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "object": T.StringType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
}


def to_spark_type(t) -> T.DataType:
    """Accept a numpy dtype/type, Python builtin type, Spark type, or name."""
    if isinstance(t, T.DataType):
        return t
    if t is int:
        return T.LongType()
    if t is float:
        return T.DoubleType()
    if t is str:
        return T.StringType()
    if t is bool:
        return T.BooleanType()
    name = getattr(t, "__name__", None) or str(t)
    try:
        import numpy as np

        name = str(np.dtype(t))
    except Exception:
        pass
    if name in _NP_TO_SPARK:
        return _NP_TO_SPARK[name]
    # last resort: let Spark parse type names like 'double', 'bigint'
    return T._parse_datatype_string(str(name))


def literal_df(spark, values, colname: str, cast: str = "string") -> DataFrame:
    """Small literal one-column DataFrame, built JVM-side.

    ``spark.createDataFrame([...])`` wraps a *Python RDD* — every evaluation
    spawns a Python worker, and inside a broadcast/AQE subplan it can be
    re-evaluated several times (measured ~25 s of overhead in a fitted-join
    plan at sf0.1).  ``range(1) + explode(array(lit...))`` keeps the literal
    entirely in the JVM: plan-only, codegen'd, free to re-evaluate.
    """
    arr = F.array(*[F.lit(v).cast(cast) for v in values])
    return spark.range(1).select(F.explode(arr).alias(colname))


def infer_spark_type_of_value(v) -> T.DataType:
    import datetime

    import numpy as np

    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, (int, np.integer)):
        return T.LongType()
    if isinstance(v, (float, np.floating)):
        return T.DoubleType()
    if isinstance(v, (datetime.datetime, np.datetime64)):
        return T.TimestampType()
    if isinstance(v, datetime.date):
        return T.DateType()
    if isinstance(v, (bytes, bytearray)):
        return T.BinaryType()
    return T.StringType()


def cheap_row_count(df: DataFrame) -> int:
    """Row count without a Spark job when the frame is a parquet scan
    (possibly projected/filtered): sums ``num_rows`` from the parquet
    footers of ``df.inputFiles()`` — driver-side metadata reads, no
    executor pass over the data.  Falls back to a ``count()`` job for
    non-file frames (local relations, post-shuffle results, non-parquet
    sources).

    With filters present the footer total is an *upper bound* on the
    true count — the safe direction for every caller in this package
    (sampling-modulus and plane-count decisions: an overestimate samples
    slightly fewer rows / adds a plane, never unbounds a driver
    collect).  Plans with row-multiplying operators (joins, generators)
    — where the footer sum could *under*-count — fall back to the job.
    At 100 TB this turns three fit-time full scans into footer reads.
    """
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if "Join" in plan or "Generate" in plan:
            return df.count()
        files = df.inputFiles()
    except Exception:
        files = []
    if files and all(f.rsplit("?", 1)[0].endswith(".parquet") for f in files):
        try:
            from urllib.parse import unquote, urlparse

            import pyarrow.parquet as pq

            total = 0
            for f in files:
                u = urlparse(f)
                if u.scheme not in ("", "file"):
                    raise ValueError(f"non-local file {f}")
                total += pq.ParquetFile(unquote(u.path)).metadata.num_rows
            return total
        except Exception:
            pass
    return df.count()


def tracked_checkpoint(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """Eager ``localCheckpoint`` that also returns the ids of the RDD
    blocks the checkpoint pinned, so iterative callers can RELEASE a
    superseded round's checkpoint (ADVICE r8: ``DataFrame.unpersist()``
    only touches the cache manager, not the checkpoint RDD — without an
    explicit release every round's label blocks accumulate in executor
    storage until driver GC happens to collect the RDD references).

    The ids are computed as the delta of the context's persistent-RDD
    map around the checkpoint call — exact as long as no *concurrent*
    thread persists in the same window (this package's iterative
    drivers are single-threaded loops).  Pair with
    :func:`release_checkpoint`."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet())
    out = df.localCheckpoint(eager=True)
    new_ids = [int(i) for i in sc._jsc.getPersistentRDDs().keySet()
               if i not in before]
    return out, new_ids


def release_checkpoint(spark, ids) -> None:
    """Unpersist the checkpoint RDD blocks captured by
    :func:`tracked_checkpoint` (non-blocking; missing ids are fine —
    the blocks may already have been GC-released)."""
    try:
        live = spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            rdd = live.get(i)
            if rdd is not None:
                rdd.unpersist(False)
    except Exception:
        pass


def exact_percentiles(df: DataFrame, cols, qs_per_col,
                      accuracy: int = 10000):
    """Exact interpolated percentiles (the same values as Spark's
    ``percentile`` / DuckDB's ``quantile_cont``) computed the
    scale-safe way: approximate BRACKET then exact-rank REFINE.

    ``percentile()`` is exact but materializes every value in executor
    memory per partition (an OOM at 100 TB) and is ~16x slower than the
    GK sketch on 6M rows (measured 18.5s vs 1.2s at sf1).  This helper:

    1. ONE agg job: per column, the non-null count and a GK
       ``approx_percentile`` at q +- 3/acc — the sketch's rank-error
       guarantee (<= n/acc) makes the two returned DATA VALUES a
       certain bracket around the target order statistics;
    2. ONE agg job: per (column, q), the exact rank of the bracket's
       low value (``count(v < lo)``), the tie counts at both bracket
       endpoints, and a sorted collect of the strictly-interior values
       — by the rank guarantee at most ~8n/acc rows (+0 ties risk:
       endpoint ties are COUNTED, never collected), driver-bounded;
    3. driver: index the order statistics out of
       (below | lo-ties | interior | hi-ties) and interpolate with
       Spark's own formula ``v_lo*(h-pos) + v_hi*(pos-l)``.

    ``accuracy`` scales with n (``max(accuracy, ceil(n/8192))``) so the
    collected window stays ~64k rows at any corpus size: pass 1 runs at
    the caller's accuracy, and iff the observed count implies a window
    over ~64k rows (n > 8192*accuracy — 82M rows at the default) it is
    re-run once with the scaled accuracy before pass 2 is built, so the
    rescale costs nothing at small n and bounds both executor agg state
    and the driver collect at any n (ADVICE r7: the contract was
    documented but unimplemented).  The GK sketch's memory is O(acc),
    so the scaled pass trades bounded sketch growth (n/8192 doubles)
    for the otherwise O(n) collect — the right side of the trade at
    every scale.  If the bracket guarantee is ever violated (defensive;
    not observed), the affected column falls back to exact
    ``percentile()``.

    cols: list of Column expressions (NaN already normalized to NULL);
    qs_per_col: list of [q, ...] per column.  Returns list of
    [value|None, ...] aligned with the inputs; None for all-NULL
    columns (matching ``percentile``'s NULL).
    """
    import math

    cols = list(cols)
    qs_per_col = [list(qs) for qs in qs_per_col]

    # pass 1: counts + bracket values
    def _pass1(acc):
        aggs = [F.count(c).alias(f"__n{i}") for i, c in enumerate(cols)]
        for i, (c, qs) in enumerate(zip(cols, qs_per_col)):
            bq = []
            for q in qs:
                bq += [max(0.0, q - 3.0 / acc), min(1.0, q + 3.0 / acc)]
            aggs.append(F.percentile_approx(
                c, F.array(*[F.lit(q) for q in bq]), F.lit(acc))
                .alias(f"__b{i}"))
        return df.agg(*aggs).collect()[0]

    acc0 = int(accuracy)
    row1 = _pass1(acc0)
    n_max = max((int(row1[f"__n{i}"]) for i in range(len(cols))),
                default=0)
    if n_max > 8192 * acc0:
        # pass-2's interior gather is <= ~8n/acc values per (col, q);
        # rescale the sketch so that window stays ~64k at any n
        acc0 = -(-n_max // 8192)
        row1 = _pass1(acc0)

    # pass 2: exact ranks + endpoint tie counts + interior gather
    aggs2, meta = [], []
    for i, (c, qs) in enumerate(zip(cols, qs_per_col)):
        n = int(row1[f"__n{i}"])
        brackets = row1[f"__b{i}"]
        for j, q in enumerate(qs):
            if n == 0:
                meta.append((i, j, n, None, None, None))
                continue
            lo = float(brackets[2 * j])
            hi = float(brackets[2 * j + 1])
            k = len(aggs2)
            aggs2 += [
                F.sum((c < F.lit(lo)).cast("long")).alias(f"__lt{k}"),
                F.sum((c == F.lit(lo)).cast("long")).alias(f"__el{k}"),
                F.sum((c == F.lit(hi)).cast("long")).alias(f"__eh{k}"),
                F.sort_array(F.collect_list(
                    F.when((c > F.lit(lo)) & (c < F.lit(hi)), c)))
                .alias(f"__mid{k}"),
            ]
            meta.append((i, j, n, lo, hi, k))
    row2 = df.agg(*aggs2).collect()[0] if aggs2 else None

    out = [[None] * len(qs) for qs in qs_per_col]
    fallback_cols = set()
    for (i, j, n, lo, hi, k) in meta:
        if n == 0:
            continue
        lt = int(row2[f"__lt{k}"] or 0)
        el = int(row2[f"__el{k}"] or 0)
        eh = int(row2[f"__eh{k}"] or 0)
        mid = list(row2[f"__mid{k}"])
        q = qs_per_col[i][j]
        pos = (n - 1) * q
        l_idx, h_idx = int(math.floor(pos)), int(math.ceil(pos))

        def stat(idx):
            kk = idx - lt
            if kk < 0:
                raise IndexError
            if lo == hi:
                # degenerate bracket (both approx points returned the
                # same data value): el and eh counted the SAME rows, so
                # only ranks [lt, lt+el) are covered — anything beyond
                # must fall back, NOT silently map into the eh block
                if kk < el:
                    return lo
                raise IndexError
            if kk < el:
                return lo
            kk -= el
            if kk < len(mid):
                return mid[kk]
            kk -= len(mid)
            if kk < eh:
                return hi
            raise IndexError

        try:
            v_l = float(stat(l_idx))
            if l_idx == h_idx:
                out[i][j] = v_l
            else:
                v_h = float(stat(h_idx))
                # Spark's Percentile short-circuits when both ranks
                # fall on the same DISTINCT value (its counts-map
                # lerp would otherwise be v*(h-p) + v*(p-l), which is
                # not bit-equal to v) — replicate exactly
                if v_h == v_l:
                    out[i][j] = v_l
                else:
                    out[i][j] = v_l * (h_idx - pos) + v_h * (pos - l_idx)
        except IndexError:
            fallback_cols.add(i)

    if fallback_cols:
        aggs3 = [F.percentile(cols[i],
                              F.array(*[F.lit(q) for q in qs_per_col[i]]))
                 .alias(f"__f{i}") for i in sorted(fallback_cols)]
        row3 = df.agg(*aggs3).collect()[0]
        for i in sorted(fallback_cols):
            vals = row3[f"__f{i}"]
            out[i] = ([None] * len(qs_per_col[i]) if vals is None
                      else [None if v is None else float(v) for v in vals])
    return out
