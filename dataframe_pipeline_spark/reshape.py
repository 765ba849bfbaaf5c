"""Reshape operators: pivot (long→wide), melt (wide→long), and
cube_agg (CUBE / GROUPING SETS without the Expand blowup).

Scale notes baked into the API:

* :func:`pivot_agg` REQUIRES the pivot value list.  Spark's
  ``.pivot(col)`` without values runs a hidden ``distinct`` job over
  the full table to discover them — an extra scan at 100 TB, and an
  unbounded output schema if the column has runaway cardinality.
  Passing values makes the plan a single partial-aggregatable
  hash aggregate (each value becomes a ``CASE WHEN`` branch inside one
  agg — map-side combine works, one shuffle on the group key) and the
  schema a reviewed, fixed contract.  Discovery, when genuinely
  needed, is explicit: ``discover_pivot_values`` (bounded by
  ``max_values``, fails loudly instead of silently widening).

* :func:`melt` is a map-only ``stack`` projection — no shuffle, no
  explode-then-filter detour; N value columns become N rows per input
  row in one codegen pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_pivot_values(df: DataFrame, pivot_col: str,
                          max_values: int = 1000) -> list:
    """Explicit (bounded) pivot-value discovery: distinct values of
    ``pivot_col``, sorted for a deterministic column order.  Raises if
    the cardinality exceeds ``max_values`` — a pivot that would emit
    thousands of columns is a modeling error, not a wide frame."""
    rows = (df.select(pivot_col).distinct()
            .limit(max_values + 1).collect())
    if len(rows) > max_values:
        raise ValueError(
            f"{pivot_col} has more than {max_values} distinct values — "
            "not a pivotable column (pass an explicit subset instead)")
    return sorted(r[0] for r in rows if r[0] is not None)


def pivot_agg(df: DataFrame, group_cols: str | list[str], pivot_col: str,
              values: list, agg, prefix: str = "") -> DataFrame:
    """Wide aggregation: one output row per group, one column per pivot
    value.  ``agg`` is a callable ``cond -> aggregate Column`` applied
    to each value's match condition — SQL ``FILTER (WHERE ...)``
    re-expressed as conditional aggregation::

        pivot_agg(ev, "user_id", "event_type", types,
                  lambda cond: F.count(F.when(cond, 1)))
        pivot_agg(ev, "user_id", "event_type", types,
                  lambda cond: F.sum(F.when(cond, F.col("value"))))

    ``values`` is mandatory (see module docstring).  Output columns are
    ``{prefix}{value}``.  This plans exactly ONE hash aggregate with one
    shuffle on the group key (plan-asserted in tests) — unlike Spark's
    built-in ``.pivot``, which stacks a second ``pivotfirst`` aggregate
    (and a second shuffle) on top of the grouped one.  NULL pivot
    values match no column (FILTER semantics)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not values:
        raise ValueError("values must be a non-empty explicit list")
    cols = [agg(F.col(pivot_col) == F.lit(v)).alias(f"{prefix}{v}")
            for v in values]
    return df.groupBy(*groups).agg(*cols)


def melt(df: DataFrame, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """Wide→long unpivot (pandas ``melt``): each of ``value_cols``
    becomes one output row per input row, labeled by ``var_name``.
    Map-only ``stack`` projection — zero shuffle; value columns are
    cast to a common type by Spark's usual coercion (mixed
    incompatible types raise at analysis, not silently stringify)."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stack = F.expr(
        f"stack({len(value_cols)}, {pairs}) as (`{var_name}`, `{value_name}`)")
    return df.select(*[F.col(c) for c in id_cols], stack)


def cube_agg(df: DataFrame, dims: list[str], sums: dict[str, str],
             count_col: str | None = None,
             grouping_sets: list[tuple] | None = None) -> DataFrame:
    """CUBE / GROUPING SETS over additive measures — from ONE scan.

    Spark's native ``cube()``/``rollup()`` plan an ``Expand`` that
    replays every input row once per grouping set (2^d scans' worth of
    rows through the aggregate for a d-dim cube).  Because ``sum`` and
    ``count`` are associative, the subtotals can instead be re-summed
    from the FINEST pre-aggregate: one scan + one shuffle to the finest
    grain (bounded by the dims' value-combination count, tiny next to
    the fact table), then each coarser set re-aggregates the pre-agg.
    At 100 TB that is the difference between one fact pass and 2^d.

    ``sums``: {output_col: input_col} summed as lossless DECIMAL
    internally (reduction-order-proof), emitted as double.
    ``count_col``: optional output name for ``count(*)`` per set.
    ``grouping_sets``: subset tuples of ``dims`` to emit (default: the
    full cube, all 2^d).  Absent dims are NULL in the output, as in
    SQL ``CUBE``.
    """
    from itertools import combinations

    if grouping_sets is None:
        grouping_sets = [c for k in range(len(dims), -1, -1)
                         for c in combinations(dims, k)]
    else:
        grouping_sets = [tuple(g) for g in grouping_sets]
        for g in grouping_sets:
            unknown = set(g) - set(dims)
            if unknown:
                raise ValueError(f"grouping set {g} not in dims: {unknown}")

    sum_exprs = [F.sum(F.col(c).cast("decimal(28,6)")).alias(f"__s_{o}")
                 for o, c in sums.items()]
    # localCheckpoint, not persist: the finest pre-aggregate is read once
    # per grouping set, and checkpoint blocks are freed when the RDD is
    # GC'd — a persist here would leak a cached DataFrame per call for
    # the session lifetime (ADVICE r4).
    base = (df.groupBy(*dims)
            .agg(*sum_exprs, F.count(F.lit(1)).alias("__n"))
            .localCheckpoint(eager=True))

    parts = []
    for g in grouping_sets:
        kept = list(g)
        agg = (base.groupBy(*kept) if kept else base.groupBy())
        re_sums = [F.sum(f"__s_{o}").alias(f"__s_{o}") for o in sums]
        p = agg.agg(*re_sums, F.sum("__n").alias("__n"))
        for d in dims:
            if d not in kept:
                p = p.withColumn(d, F.lit(None).cast(dict(df.dtypes)[d]))
        parts.append(p.select(*dims, *[f"__s_{o}" for o in sums], "__n"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    sel = [*dims,
           *[F.col(f"__s_{o}").cast("double").alias(o) for o in sums]]
    if count_col:
        sel.append(F.col("__n").alias(count_col))
    return out.select(*sel)
