"""Local replica of the driver's correctness gate: run every declared query
on Spark AND its DuckDB oracle at sf0.01, compare row count, schema, and
order-insensitive values.  Prints one line per query + a summary.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    return v


def norm_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in cols) for _, r in df.iterrows()]

    def key(t):
        return tuple(
            (2, "") if x is None
            else (0, float(x)) if isinstance(x, (int, float)) and not isinstance(x, bool)
            else (1, str(x))
            for x in t
        )

    return sorted(rows, key=key), cols


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql(sf_dir, names=only or None)
    ok = bad = skipped = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        got = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows={len(got):7d}  (rows-only check, no oracle)")
            skipped += 1
            continue
        exp = con.sql(oracles[name]).df()
        problems = []
        if len(got) != len(exp):
            problems.append(f"rowcount {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        if not problems:
            g, _ = norm_rows(got)
            e, _ = norm_rows(exp)
            if g != e:
                n_bad = sum(1 for a, b in zip(g, e) if a != b)
                first = next(((a, b) for a, b in zip(g, e) if a != b), None)
                problems.append(f"values differ in {n_bad}/{len(g)} rows, first: {first}")
        if problems:
            print(f"{name:24s} MISMATCH: {'; '.join(problems)}")
            bad += 1
        else:
            print(f"{name:24s} rows={len(got):7d}  OK")
            ok += 1
    print(f"\n{ok} ok, {bad} mismatched, {skipped} rows-only")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
