"""Temporal joins Spark's DataFrame API lacks as primitives.

``asof_join`` — for each left row, the single closest right row with
matching keys (pandas ``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF
JOIN`` semantics) in the chosen ``direction``: backward
(``right_ts <= left_ts``, default), forward (``>=``), or nearest.

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
from pyspark.sql.types import StructField, StructType


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tolerance_us: int | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join; carries ``right_cols`` onto every left row.

    ``direction`` (pandas ``merge_asof`` semantics, all inclusive):

    * ``backward`` — most recent right row with ``right_ts <= left_ts``
      (the default; kdb ``aj`` / DuckDB ``ASOF`` shape).
    * ``forward`` — earliest right row with ``right_ts >= left_ts``.
    * ``nearest`` — whichever of the two is closer in time; ties (equal
      distance, including an exact timestamp match) go backward, as in
      pandas.

    ``tolerance_us``: if set, matches further than this many
    microseconds from ``left_ts`` are nulled out
    (pandas ``merge_asof(tolerance=)``).

    Every direction keeps the one-shuffle union shape: ``nearest``
    evaluates a backward ``last`` and a forward ``first`` window over
    the SAME sorted partition (one Exchange, one Sort, two window
    passes) and picks per-row by distance.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"not {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_ts]]
    # exclude left_ts too: it re-enters the output via the __asof_ts
    # re-alias in the final select — including it here would emit two
    # identically-named columns and make every by-name reference to the
    # timestamp downstream AMBIGUOUS_REFERENCE.
    payload = [c for c in left.columns if c not in keys + [left_ts]]

    # The carried right payload travels as ONE struct(ts, cols...) so the
    # running last/first(ignorenulls) skips whole unmatched rows, never
    # individual NULL fields: a NULL in a matched right row stays NULL in
    # the output (pandas merge_asof parity), and in 'nearest' mode every
    # carried column + the age used for tolerance come from the SAME row.
    struct_type = StructType(
        [StructField("__ts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_cols])
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__is_l"),
        *payload,
        F.lit(None).cast(struct_type).alias("__r"),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
        F.struct(F.col(right_ts).alias("__ts"),
                 *[F.col(c).alias(c) for c in right_cols]).alias("__r"),
    )

    filled = l_side.unionByName(r_side)
    # sort order at EQUAL timestamps decides inclusivity: backward wants
    # the right row BEFORE the left row (inside the preceding frame);
    # forward wants it AFTER (inside the following frame).  nearest uses
    # the backward ordering — the equal-ts match lands in the backward
    # frame with distance 0, which wins every tie anyway.
    fwd_order = [F.col("__asof_ts").asc(), F.col("__is_l").desc()]
    bwd_order = [F.col("__asof_ts").asc(), F.col("__is_l").asc()]
    w_bwd = (Window.partitionBy(*keys)
             .orderBy(*(fwd_order if direction == "forward" else bwd_order))
             .rowsBetween(Window.unboundedPreceding, 0))
    w_fwd = (Window.partitionBy(*keys)
             .orderBy(*(fwd_order if direction == "forward" else bwd_order))
             .rowsBetween(0, Window.unboundedFollowing))

    bwd = F.last("__r", ignorenulls=True).over(w_bwd)
    fwd = F.first("__r", ignorenulls=True).over(w_fwd)

    lts = F.unix_micros(F.col("__asof_ts"))
    if direction == "backward":
        matched = bwd
        age = lts - F.unix_micros(matched.getField("__ts"))
    elif direction == "forward":
        matched = fwd
        age = F.unix_micros(matched.getField("__ts")) - lts
    else:  # nearest
        bwd_age = lts - F.unix_micros(bwd.getField("__ts"))
        fwd_age = F.unix_micros(fwd.getField("__ts")) - lts
        take_bwd = fwd.isNull() | (bwd.isNotNull() & (bwd_age <= fwd_age))
        matched = F.when(take_bwd, bwd).otherwise(fwd)
        age = F.when(take_bwd, bwd_age).otherwise(fwd_age)
    if tolerance_us is not None:
        matched = F.when(age <= tolerance_us, matched)
    filled = filled.withColumn("__r", matched)
    return (
        filled.filter(F.col("__is_l") == 1)
        .select(*keys, F.col("__asof_ts").alias(left_ts), *payload,
                *[F.col("__r").getField(c).alias(c) for c in right_cols])
    )
