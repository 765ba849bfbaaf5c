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
