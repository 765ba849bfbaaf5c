"""Declarative data-quality expectations — the validation gate a
large-scale ingest/training pipeline runs before it trusts a snapshot
(null rates, ranges, domains, uniqueness, referential integrity,
freshness), plus a row-level quarantine splitter for routing bad rows.

Design for the 100 TB case:

* ``ExpectationSuite.report(df)`` compiles EVERY aggregate-style check
  into ONE hash-aggregate job over ONE scan — conditional counts
  (``sum(CASE WHEN bad)``) and min/max/mean/distinct all evaluate in
  the same partial+final aggregation, so adding a check never adds a
  pass.  The 1-row wide result is unpivoted into the per-check report
  with an ``inline(array(struct(...)))`` over that single row —
  O(checks), not a data pass.
* Uniqueness uses ``approx_count_distinct`` (HLL++, fixed memory,
  partial-aggregatable) by default; ``exact=True`` opts into exact
  distinct counts for audit scale and oracle parity.  BOTH forms run
  as their own column-pruned 1-row sub-aggregates cross-joined
  (broadcast) back onto the wide row — still one job.  An exact
  distinct embedded in the wide aggregate would re-key the WHOLE
  aggregate by the checked column (one row per key through the
  exchange, every other check's sum as per-key partial state —
  measured 2.3x at sf1); an inline HLL sketch is an imperative
  aggregate that drags the whole wide stage off whole-stage codegen
  (measured +0.67 s at sf1).  Decomposed, the subtree shuffles only
  the deduplicated key / the sketch and the wide pass stays codegen.
* Referential checks (``fk_in``) are the one shape that genuinely
  needs a second relation.  Each dimension's (deduplicated) key set
  is LEFT-joined with a hit marker onto a projection of JUST the
  checked column, and the miss count aggregates in that same narrow
  subtree, cross-joined onto the report like exact unique.  The join
  is size-gate broadcast (map-side probe when the dim fits; keyed
  shuffle when it doesn't), the probe reads one column, and the
  subtree overlaps the wide aggregate inside the one job.
* ``quarantine(df)`` evaluates only the ROW-LEVEL checks (not_null /
  in_range / in_set / matches) as a map-only projection: returns
  (good, bad) where ``bad`` carries a ``_failed`` array naming the
  violated checks.  No shuffle, no Python — the split is two codegen
  filters over the same scan.

The report schema is stable and engine-portable (one row per check):
``check / column / passed / observed / n_bad`` — ``observed`` is the
measured statistic rounded to 6 decimals (fraction, count, or value
depending on the check), ``n_bad`` the violating-row count where the
check has row granularity (NULL for table-level checks).

Reference parity: the reference engine has no validation surface; this
tier is part of the driver's beyond-reference training-pipeline ask and
follows the same fit/transform-free functional style as profiling.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import maybe_broadcast

REPORT_COLUMNS = ["check", "column", "passed", "observed", "n_bad"]


def _sq(s: str) -> str:
    """SQL single-quoted string literal (backslash-escaped dialect)."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bq(name: str) -> str:
    """Backtick-quoted identifier."""
    return "`" + str(name).replace("`", "``") + "`"


def _num(v) -> str:
    """SQL numeric literal; infinities as typed casts."""
    import math

    f = float(v)
    if math.isinf(f):
        sign = "-" if f < 0 else ""
        return f"CAST('{sign}Infinity' AS DOUBLE)"
    return repr(f)


@dataclass(frozen=True)
class Check:
    """One expectation.  ``kind`` ∈ {not_null, in_range, in_set,
    matches, unique, row_count, mean_between, fresh, fk_in}."""

    kind: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    max_bad_frac: float = 0.0
    ref: Any = None          # fk_in: (dim_df, dim_col); fresh: cutoff ts
    name: str | None = None

    @property
    def label(self) -> str:
        return self.name or (
            f"{self.kind}({self.column})" if self.column else self.kind)


def not_null(column: str, max_null_frac: float = 0.0, name: str | None = None) -> Check:
    return Check("not_null", column, max_bad_frac=max_null_frac, name=name)


def in_range(column: str, lo: float, hi: float,
             max_bad_frac: float = 0.0, name: str | None = None) -> Check:
    return Check("in_range", column, lo=lo, hi=hi,
                 max_bad_frac=max_bad_frac, name=name)


def in_set(column: str, values, max_bad_frac: float = 0.0,
           name: str | None = None) -> Check:
    return Check("in_set", column, values=tuple(values),
                 max_bad_frac=max_bad_frac, name=name)


def matches(column: str, pattern: str, max_bad_frac: float = 0.0,
            name: str | None = None) -> Check:
    """Regex SEARCH against an engine-portable ERE (Spark ``rlike`` /
    DuckDB ``regexp_matches`` semantics) — anchor with ``^``/``$`` for a
    full match."""
    return Check("matches", column, pattern=pattern,
                 max_bad_frac=max_bad_frac, name=name)


def unique(column: str, name: str | None = None) -> Check:
    return Check("unique", column, name=name)


def row_count(lo: float, hi: float = float("inf"), name: str | None = None) -> Check:
    return Check("row_count", None, lo=lo, hi=hi, name=name)


def mean_between(column: str, lo: float, hi: float, name: str | None = None) -> Check:
    return Check("mean_between", column, lo=lo, hi=hi, name=name)


def fresh(column: str, cutoff, name: str | None = None) -> Check:
    """Newest timestamp in ``column`` must be >= ``cutoff`` (a literal —
    callers pass their clock; the library never reads one)."""
    return Check("fresh", column, ref=cutoff, name=name)


def fk_in(column: str, dim: DataFrame, dim_col: str,
          max_bad_frac: float = 0.0, name: str | None = None) -> Check:
    """Referential integrity: every non-null value of ``column`` exists
    in ``dim[dim_col]``."""
    return Check("fk_in", column, ref=(dim, dim_col),
                 max_bad_frac=max_bad_frac, name=name)


_ROW_LEVEL = {"not_null", "in_range", "in_set", "matches"}


@dataclass
class ExpectationSuite:
    checks: list = field(default_factory=list)
    exact: bool = False  # exact distinct counts (audit / oracle parity)
    #: HLL++ relative standard deviation for approx ``unique`` checks.
    #: In approx mode a unique check passes when the estimated
    #: duplicate count is within 2×rsd of the non-null count — the
    #: sketch's own error band — so it detects GROSS duplication
    #: without false-failing unique data on estimation noise; use
    #: ``exact=True`` when duplicates near zero must be caught.
    rsd: float = 0.05

    # -- row-level predicate: True = row passes this check ------------
    def _row_pred(self, c: Check):
        col = F.col(c.column)
        if c.kind == "not_null":
            return col.isNotNull()
        if c.kind == "in_range":
            return col.isNull() | ((col >= c.lo) & (col <= c.hi))
        if c.kind == "in_set":
            return col.isNull() | col.isin(*c.values)
        if c.kind == "matches":
            return col.isNull() | (col.cast("string").rlike(c.pattern))
        raise ValueError(f"not a row-level check: {c.kind}")

    # -- row-level predicate as a SQL expression string ---------------
    def _row_pred_sql(self, c: Check) -> str:
        col = _bq(c.column)
        if c.kind == "not_null":
            return f"{col} IS NOT NULL"
        if c.kind == "in_range":
            return (f"({col} IS NULL OR ({col} >= {_num(c.lo)} "
                    f"AND {col} <= {_num(c.hi)}))")
        if c.kind == "in_set":
            vals = ", ".join(_sq(v) if isinstance(v, str) else repr(v)
                             for v in c.values)
            return f"({col} IS NULL OR {col} IN ({vals}))"
        if c.kind == "matches":
            return (f"({col} IS NULL OR "
                    f"CAST({col} AS STRING) RLIKE {_sq(c.pattern)})")
        raise ValueError(f"not a row-level check: {c.kind}")

    def report(self, df: DataFrame) -> DataFrame:
        """One row per check: ``check, column, passed, observed, n_bad``.
        ONE aggregate job over ONE scan for every check — fk dims are
        pre-joined as broadcast hit markers so their miss counts ride
        the same aggregation.

        The aggregate and the per-check unpivot are generated as SQL
        expression STRINGS, not Column objects: a wide suite built
        Column-by-Column is hundreds of py4j round-trips (profiled at
        ~2s of pure driver time per call on a 9-check suite, dwarfing
        the 0.09s execution at sf1); the string form reaches the same
        plan in a handful of calls.

        Two check kinds leave the wide aggregate and run as NARROW
        1-row sub-aggregates cross-joined (broadcast) onto it — still
        ONE job, but each subtree scans only its own column:

        * ``unique``: a ``count(DISTINCT k)`` embedded in the wide
          aggregate re-keys the WHOLE aggregate by ``k`` (every
          conditional sum becomes per-key partial state through the
          exchange — measured 2.3x the decomposed plan at sf1), and
          an inline HLL sketch is an imperative aggregate that drags
          the whole wide stage off whole-stage codegen (measured
          +0.67 s at sf1).
        * ``fk_in``: the hit-marker join above the fact scan blocked
          scan→aggregate fusion and serialized after the wide pass;
          as its own column-pruned subtree it overlaps the wide
          aggregate inside the same job."""
        if not self.checks:
            raise ValueError("ExpectationSuite has no checks")
        base = df
        extras: list[DataFrame] = []  # 1-row narrow sub-aggregates

        for i, c in enumerate(self.checks):
            if c.kind == "fk_in":
                dim, dim_col = c.ref
                keys = (dim.select(F.col(dim_col).alias(f"_fk{i}"))
                        .dropDuplicates()
                        .withColumn(f"_hit{i}", F.lit(1)))
                sub = (base.select(base[c.column].alias(f"_v{i}"))
                       .join(maybe_broadcast(keys),
                             F.col(f"_v{i}") == F.col(f"_fk{i}"), "left")
                       .agg(F.expr(f"sum(CAST((_v{i} IS NOT NULL AND "
                                   f"_hit{i} IS NULL) AS BIGINT)) AS _m{i}")))
                extras.append(sub)
            elif c.kind == "unique":
                dcnt = (F.count_distinct(F.col(f"_u{i}")) if self.exact
                        else F.expr(f"approx_count_distinct(_u{i}, "
                                    f"{self.rsd!r})"))
                extras.append(
                    base.select(base[c.column].alias(f"_u{i}"))
                    .agg(dcnt.alias(f"_m{i}")))

        aggs = ["count(1) AS _n"]
        for i, c in enumerate(self.checks):
            a = f"_m{i}"
            if c.kind in _ROW_LEVEL:
                aggs.append(f"sum(CAST(NOT ({self._row_pred_sql(c)}) "
                            f"AS BIGINT)) AS {a}")
            elif c.kind == "fk_in":
                pass  # miss count computed in its narrow subtree
            elif c.kind == "unique":
                aggs.append(f"count({_bq(c.column)}) AS {a}nn")
            elif c.kind == "mean_between":
                # exact decimal sum (6-dp quantized), divided in double:
                # the mean is bit-identical across engines and partition
                # orders — a double sum's reduction order could flip the
                # 6-dp rounding at a boundary.
                aggs.append(
                    f"CAST(sum(CAST({_bq(c.column)} AS DECIMAL(28,6))) "
                    f"AS DOUBLE) / count({_bq(c.column)}) AS {a}")
            elif c.kind == "fresh":
                aggs.append(f"max({_bq(c.column)}) AS {a}")
            elif c.kind == "row_count":
                pass  # reads _n
            else:
                raise ValueError(f"unknown check kind: {c.kind}")
        wide = base.agg(*[F.expr(s) for s in aggs])
        for sub in extras:
            wide = wide.crossJoin(F.broadcast(sub))

        rows = []
        for i, c in enumerate(self.checks):
            a = f"_m{i}"
            lbl = _sq(c.label)
            coln = _sq(c.column) if c.column else "CAST(NULL AS STRING)"
            if c.kind in _ROW_LEVEL or c.kind == "fk_in":
                frac = f"({a} / GREATEST(_n, 1))"
                passed = f"{frac} <= {c.max_bad_frac!r}"
                observed = f"CAST(ROUND({frac}, 6) AS DOUBLE)"
                n_bad = f"CAST({a} AS BIGINT)"
            elif c.kind == "unique":
                dup = f"({a}nn - {a})"
                tol = ("0" if self.exact
                       else f"({2.0 * self.rsd!r} * {a}nn)")
                passed = f"{dup} <= {tol}"
                observed = f"CAST({a} AS DOUBLE)"
                n_bad = f"CAST(GREATEST({dup}, 0) AS BIGINT)"
            elif c.kind == "mean_between":
                passed = f"({a} >= {_num(c.lo)} AND {a} <= {_num(c.hi)})"
                observed = f"CAST(ROUND({a}, 6) AS DOUBLE)"
                n_bad = "CAST(NULL AS BIGINT)"
            elif c.kind == "fresh":
                passed = f"{a} >= CAST({_sq(str(c.ref))} AS TIMESTAMP)"
                # unix_micros/1e6, not unix_timestamp: keep sub-second
                # precision so observed matches DuckDB's epoch()
                observed = (f"CAST(ROUND(unix_micros(CAST({a} AS "
                            f"TIMESTAMP)) / 1000000.0, 6) AS DOUBLE)")
                n_bad = "CAST(NULL AS BIGINT)"
            else:  # row_count
                passed = f"(_n >= {_num(c.lo)} AND _n <= {_num(c.hi)})"
                observed = "CAST(_n AS DOUBLE)"
                n_bad = "CAST(NULL AS BIGINT)"
            rows.append(
                f"named_struct('check', {lbl}, 'column', {coln}, "
                f"'passed', {passed}, 'observed', {observed}, "
                f"'n_bad', {n_bad})")
        return wide.selectExpr(f"inline(array({', '.join(rows)}))")

    def validate(self, df: DataFrame) -> bool:
        """True iff every check passes (collects the tiny report)."""
        return all(r["passed"] for r in self.report(df).collect())

    def validate_or_raise(self, df: DataFrame) -> None:
        failed = [r for r in self.report(df).collect() if not r["passed"]]
        if failed:
            detail = "; ".join(
                f"{r['check']} observed={r['observed']}" for r in failed)
            raise ValueError(f"{len(failed)} expectation(s) failed: {detail}")

    def quarantine(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Split on the suite's ROW-LEVEL checks: ``(good, bad)`` where
        ``bad`` gains a ``_failed`` array of violated check labels.
        Map-only: two codegen filters over the same scan, no shuffle,
        no Python."""
        row_checks = [c for c in self.checks if c.kind in _ROW_LEVEL]
        if not row_checks:
            raise ValueError("quarantine needs at least one row-level "
                             "check (not_null/in_range/in_set/matches)")
        preds = [self._row_pred(c) for c in row_checks]
        all_ok = preds[0]
        for p in preds[1:]:
            all_ok = all_ok & p
        good = df.filter(all_ok)
        failed = F.array_compact(F.array(*[
            F.when(~p, F.lit(c.label))
            for c, p in zip(row_checks, preds)]))
        bad = (df.withColumn("_failed", failed)
               .filter(F.size("_failed") > 0))
        return good, bad
