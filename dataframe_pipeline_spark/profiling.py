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
``exact=True`` switches to exact ``count(distinct)``, required for the
DuckDB parity oracle: each exact distinct runs as its OWN column-pruned
1-row sub-aggregate cross-joined (broadcast) onto the wide result —
still one job, one narrow dedup exchange per audited column.  (Embedded
in the wide aggregate, Catalyst plans multiple distincts via EXPAND —
one duplicated full-width stream per column, measured 4x slower at sf1
than the decomposed form, and the subtrees overlap inside the job.)

Numeric min/max/mean are emitted as doubles and string min/max as
strings (separate columns, no lossy casting of one into the other's
format — double→string rendering differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
    extras = []  # exact-distinct 1-row narrow sub-aggregates
    for c in names:
        t = types[c]
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if exact:
            extras.append(df.select(df[c].alias("__v")).agg(
                F.count_distinct(F.col("__v")).alias(f"__nd_{c}")))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
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
    for sub in extras:
        wide = wide.crossJoin(F.broadcast(sub))

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


def psi_drift(base: DataFrame, cur: DataFrame,
              num_cols: list[str] | None = None,
              cat_cols: list[str] | None = None,
              n_bins: int = 10) -> DataFrame:
    """Population-stability-index drift report between two snapshots —
    the monitoring twin of the expectations gate (has a feature's
    distribution moved since the reference snapshot?).

    PSI per column = Σ_bins (p_i − q_i) · ln(p_i / q_i) with p = the
    base snapshot's bin share and q = the current one's (>0.25 is the
    conventional "investigate" threshold).  Numeric columns bin into
    ``n_bins`` equal widths over the BASE min/max (two scalar literals
    folded at plan time — the one collect) with NULLs excluded and
    outside-range values clamped to the edge bins; categorical columns
    use the category itself as the bin.  Shares are Laplace-smoothed
    (+0.5 per bin) so an empty bin never produces ±inf.

    Cost: one aggregate per side per column family — each is a tiny
    keyed count (≤ n_bins or ≤ |categories| rows) off one scan of each
    snapshot; the PSI arithmetic runs on the joined bin tables.

    Cross-engine determinism (same discipline as text.NgramScorer):
    every share is an exact integer-count division, each bin's PSI term
    is quantized to 9 dp and summed as exact DECIMAL — partition
    reduction order cannot move the 6-dp result.
    """
    num_cols = num_cols or []
    cat_cols = cat_cols or []
    if not num_cols and not cat_cols:
        raise ValueError("psi_drift needs at least one column")

    def _bin_expr(c: str, lo: float, hi: float):
        w = (hi - lo) / n_bins if hi > lo else 1.0
        raw = F.floor((F.col(c) - F.lit(lo)) / F.lit(w)).cast("int")
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))

    def _shares(df: DataFrame, key) -> DataFrame:
        cnt = (df.filter(key.isNotNull())
               .groupBy(key.alias("bin"))
               .agg(F.count(F.lit(1)).alias("c")))
        return cnt

    parts = []
    for c in num_cols:
        mm = base.agg(F.min(F.col(c).cast("double")).alias("lo"),
                      F.max(F.col(c).cast("double")).alias("hi")).head()
        if mm["lo"] is None or mm["hi"] is None:
            raise ValueError(
                f"psi_drift: base snapshot has no non-null values for "
                f"numeric column {c!r}; cannot derive bin edges")
        lo, hi = float(mm["lo"]), float(mm["hi"])
        pb = _shares(base, _bin_expr(c, lo, hi))
        qb = _shares(cur, _bin_expr(c, lo, hi))
        parts.append((c, pb, qb))
    for c in cat_cols:
        parts.append((c, _shares(base, F.col(c).cast("string")),
                      _shares(cur, F.col(c).cast("string"))))

    outs = []
    for c, pb, qb in parts:
        j = (pb.withColumnRenamed("c", "cp")
             .join(qb.withColumnRenamed("c", "cq"), "bin", "full"))
        tp = F.sum(F.coalesce(F.col("cp"), F.lit(0)))
        tq = F.sum(F.coalesce(F.col("cq"), F.lit(0)))
        nb = F.count(F.lit(1))
        w = Window.partitionBy()
        p = ((F.coalesce(F.col("cp"), F.lit(0)) + F.lit(0.5))
             / (tp.over(w) + F.lit(0.5) * nb.over(w)))
        q = ((F.coalesce(F.col("cq"), F.lit(0)) + F.lit(0.5))
             / (tq.over(w) + F.lit(0.5) * nb.over(w)))
        term = F.round((p - q) * F.log(p / q), 9).cast("decimal(18,9)")
        outs.append(
            j.select(term.alias("t"))
            .agg(F.round(F.sum("t").cast("double"), 6).alias("psi"))
            .select(F.lit(c).alias("column"), "psi"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
