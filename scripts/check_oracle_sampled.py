"""Value-check large-output queries at big scale factors on a
deterministic 1% sample of the OUTPUT rows.

The full checker (`check_oracle.py`) materializes both engines' entire
result into Python tuples — fine at the driver's sf0.01/sf0.1, but the
row-parallel transform queries emit the full 6M-row lineitem width at
sf1 and the *Python compare* (not the engines) becomes the bottleneck.
This variant applies the SAME deterministic md5-modulus filter to both
engines' results (Spark: post-transform filter; DuckDB: wrapper around
the oracle SQL), so both sides produce the identical ~1% row subset and
the value compare stays exact — every compared cell is still computed
by the full query over the full data.

Sampling key: the first integer-typed column (ids in this repo are
int32/int64). md5(key)::first-8-hex % MOD == RESIDUE picks rows
content-addressed, so partitioning/order can't bias the sample.
Queries with no integer column fall back to a full compare.

Usage: python scripts/check_oracle_sampled.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from check_oracle import TABLES, norm_rows  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402

MOD, RESIDUE = 100, 7
INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check-sampled")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql(sf_dir, names=only or None)
    ok = bad = 0
    for name in sorted(qs):
        if (only and name not in only) or name not in oracles:
            continue
        sdf = qs[name](spark, sf_dir)
        key = next((c for c, t in sdf.dtypes if t in INT_TYPES), None)
        if key is None:
            print(f"{name:24s} no integer column — run full checker")
            continue
        frac = F.conv(
            F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10
        ).cast("bigint") % MOD
        got = sdf.filter(frac == RESIDUE).toPandas()
        sql = (
            f"SELECT * FROM ({oracles[name]}) __t "
            f"WHERE (('0x' || substr(md5(\"{key}\"::VARCHAR), 1, 8))::BIGINT)"
            f" % {MOD} = {RESIDUE}"
        )
        exp = con.sql(sql).df()
        problems = []
        if len(got) != len(exp):
            problems.append(f"rowcount {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"columns {sorted(got.columns)}"
                            f" vs {sorted(exp.columns)}")
        if not problems:
            g, _ = norm_rows(got)
            e, _ = norm_rows(exp)
            if g != e:
                n_bad = sum(1 for a, b in zip(g, e) if a != b)
                first = next(((a, b) for a, b in zip(g, e) if a != b), None)
                problems.append(
                    f"values differ in {n_bad}/{len(g)} rows, first: {first}")
        if problems:
            bad += 1
            print(f"{name:24s} sample_key={key} rows={len(got):7d}  "
                  f"MISMATCH: {'; '.join(problems)}")
        else:
            ok += 1
            print(f"{name:24s} sample_key={key} rows={len(got):7d}  OK")

    print(f"\n{ok} ok, {bad} mismatched (1/{MOD} content-addressed sample)")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
