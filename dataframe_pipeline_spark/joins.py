"""Temporal joins Spark's DataFrame API lacks as primitives.

``asof_join`` — for each left row, the single most recent right row with
matching keys and ``right_ts <= left_ts`` (pandas ``merge_asof`` /
kdb ``aj`` / DuckDB ``ASOF JOIN`` semantics, direction='backward').

Spark-first design — the **union + running-last trick**, not a range
self-join:

    tag left rows 1, right rows 0 → unionByName → one shuffle on the
    join key → per key, sort by (ts, tag) and carry each right column
    forward with last(ignorenulls) over rows-unbounded-preceding →
    keep the left-tagged rows.

Why this shape at 100 TB: a naive ``l.join(r, key && r.ts <= l.ts)``
explodes to |matches| rows per left row before a groupBy-max prunes
them — quadratic in versions-per-key.  The union form shuffles each
input exactly once, never materializes more than |L|+|R| rows, and the
running ``last`` is a streaming pass inside the sorted partition.  At
equal timestamps the right row sorts first (tag 0 < 1), giving the
inclusive `<=` match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tolerance_us: int | None = None) -> DataFrame:
    """Backward as-of join; carries ``right_cols`` onto every left row.

    ``tolerance_us``: if set, matches older than this many microseconds
    before ``left_ts`` are nulled out (pandas ``merge_asof(tolerance=)``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_ts]]
    # exclude left_ts too: it re-enters the output via the __asof_ts
    # re-alias in the final select — including it here would emit two
    # identically-named columns and make every by-name reference to the
    # timestamp downstream AMBIGUOUS_REFERENCE.
    payload = [c for c in left.columns if c not in keys + [left_ts]]

    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__is_l"),
        *payload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )

    w = (Window.partitionBy(*keys).orderBy("__asof_ts", "__is_l")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = l_side.unionByName(r_side)
    out_cols = {f"__r_{c}": F.last(f"__r_{c}", ignorenulls=True).over(w)
                for c in right_cols}
    if tolerance_us is not None:
        matched_ts = F.last(
            F.when(F.col("__is_l") == 0, F.col("__asof_ts")),
            ignorenulls=True).over(w)
        age = F.unix_micros(F.col("__asof_ts")) - F.unix_micros(matched_ts)
        out_cols = {c: F.when(age <= tolerance_us, e)
                    for c, e in out_cols.items()}
    filled = filled.withColumns(out_cols)
    return (
        filled.filter(F.col("__is_l") == 1)
        .select(*keys, F.col("__asof_ts").alias(left_ts), *payload,
                *[F.col(f"__r_{c}").alias(c) for c in right_cols])
    )
