"""Single-pass column profiler — the data-quality snapshot step a
pipeline runs before/after every major transform (row counts, null
rates, cardinalities, ranges) without N-passes-for-N-columns.

Design: ONE aggregate job computes every statistic for every requested
column (Catalyst evaluates them all in a single partial+final
aggregation over one scan), then the 1-row wide result is unpivoted
driver-side into the long per-column frame — the unpivot touches a
single row, so the output build is O(columns), not a data pass.

Distinct counts default to ``approx_count_distinct`` (HLL++, fixed
sketch memory, partial-aggregatable — the only sane choice at 100 TB).
``exact=True`` switches to exact ``count(distinct)``: Catalyst plans
multiple distinct aggregates via EXPAND (one duplicated stream per
column), an O(n_cols×rows) blowup that is affordable at audit scale
and required for the DuckDB parity oracle.

Numeric min/max/mean are emitted as doubles and string min/max as
strings (separate columns, no lossy casting of one into the other's
format — double→string rendering differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}

PROFILE_COLUMNS = ["col_name", "n_rows", "n_nonnull", "n_distinct",
                   "min_num", "max_num", "mean_num", "min_str", "max_str"]


def profile(df: DataFrame, cols: list[str] | None = None,
            exact: bool = False) -> DataFrame:
    """One row per requested column: total rows, non-null count,
    distinct count (approx by default, ``exact=True`` for parity
    audits), numeric min/max/mean, string min/max.

    Decimal/date/timestamp columns profile as strings (ordered
    min/max still meaningful); arrays/maps/structs only count.
    """
    names = cols or df.columns
    types = dict(df.dtypes)
    missing = [c for c in names if c not in types]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in names:
        t = types[c]
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append((F.count_distinct(F.col(c)) if exact
                     else F.approx_count_distinct(F.col(c))
                     ).alias(f"__nd_{c}"))
        if t in NUMERIC:
            aggs += [F.min(c).cast("double").alias(f"__min_{c}"),
                     F.max(c).cast("double").alias(f"__max_{c}"),
                     F.avg(c).alias(f"__mean_{c}")]
        elif t == "string":
            aggs += [F.min(c).alias(f"__smin_{c}"),
                     F.max(c).alias(f"__smax_{c}")]
        elif t in ("date",) or t.startswith("timestamp") or \
                t.startswith("decimal"):
            aggs += [F.min(c).cast("string").alias(f"__smin_{c}"),
                     F.max(c).cast("string").alias(f"__smax_{c}")]
    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in names:
        has_num = f"__min_{c}" in wide.columns
        has_str = f"__smin_{c}" in wide.columns
        rows.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            (F.col(f"__min_{c}") if has_num else null_d).alias("min_num"),
            (F.col(f"__max_{c}") if has_num else null_d).alias("max_num"),
            (F.col(f"__mean_{c}") if has_num else null_d).alias("mean_num"),
            (F.col(f"__smin_{c}") if has_str else null_s).alias("min_str"),
            (F.col(f"__smax_{c}") if has_str else null_s).alias("max_str"),
        ))
    return (wide.select(F.explode(F.array(*rows)).alias("p"))
            .select("p.*"))


def histogram(df: DataFrame, col: str, n_bins: int = 10,
              lo: float | None = None,
              hi: float | None = None) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bin, lo, hi, n).

    If ``lo``/``hi`` are omitted they are fitted with one min/max agg
    (a driver round-trip of two doubles); the binning itself is a
    single hash aggregate on the computed bin id — one shuffle of at
    most ``n_bins`` partial rows per partition.  Values exactly at
    ``hi`` land in the last bin (right-closed top bin, numpy
    convention); NULL/NaN rows are excluded.  Empty bins are emitted
    with n=0 via a range join against a literal bin frame, so the
    output is always exactly ``n_bins`` rows — a histogram whose empty
    bins silently vanish misleads every consumer downstream.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    v = F.col(col).cast("double")
    v = F.when(F.isnan(v), None).otherwise(v)
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    if lo is None or hi is None or not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    w = (hi - lo) / n_bins
    bin_id = F.least(F.floor((v - F.lit(lo)) / F.lit(w)),
                     F.lit(n_bins - 1)).cast("int")
    counts = (df.filter(v.isNotNull()
                        & (v >= F.lit(lo)) & (v <= F.lit(hi)))
              .groupBy(bin_id.alias("bin"))
              .agg(F.count(F.lit(1)).alias("n")))
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (bins.join(counts, "bin", "left")
            .select("bin",
                    (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
                    (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
                    F.coalesce(F.col("n"), F.lit(0)).alias("n")))


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations in long form (col_a, col_b, corr),
    upper triangle including the diagonal.

    All C(n,2)+n correlations are computed in ONE aggregate over ONE
    scan (each ``corr`` is partial-aggregatable sufficient statistics:
    sums, squares, cross-products — constant state per pair), then the
    1-row wide result unpivots driver-side like :func:`profile`.  Row
    pairs with a NULL/NaN in either column are excluded per pair
    (pairwise deletion — SQL ``corr`` semantics in both engines)."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    types = dict(df.dtypes)
    bad = [c for c in cols if types.get(c) not in NUMERIC]
    if bad:
        raise ValueError(f"non-numeric columns: {bad}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    aggs = [F.corr(a, b).alias(f"__c_{i}") for i, (a, b) in enumerate(pairs)]
    wide = df.agg(*aggs)
    rows = [F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                     F.col(f"__c_{i}").alias("corr"))
            for i, (a, b) in enumerate(pairs)]
    return (wide.select(F.explode(F.array(*rows)).alias("p"))
            .select("p.*"))


def key_skew(df: DataFrame, col: str, top: int = 10) -> DataFrame:
    """Heavy-hitter diagnosis for a join/group key: the ``top`` most
    frequent values with their absolute count and share of all rows —
    the measurement that decides between a plain join, AQE skew
    handling, and an explicit ``salted_join``.

    One grouped count (partial-aggregatable) + a TakeOrderedAndProject
    heap for the top slice; the total row count rides along as a
    grouped sum instead of a second scan.  NULL keys are reported as a
    value like any other — a null-heavy FK is the single most common
    real-world skew source."""
    counts = df.groupBy(F.col(col).alias("key")).agg(
        F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t"))
    return (counts.crossJoin(F.broadcast(total))
            .select("key", "n",
                    F.round(F.col("n") / F.col("__t"), 6).alias("share"))
            .orderBy(F.desc("n"), F.asc_nulls_last("key"))
            .limit(top))
