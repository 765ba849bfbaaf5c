"""Shared example runner: load a testdata table, run a pipeline, report."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframe_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run(name, build_pipeline, table="lineitem", prep=None, explain=False):
    """build_pipeline(df) -> DataframePipeline; prep(df) -> df (optional)."""
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    spark = get_spark(name)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if prep is not None:
        df = prep(df)
    pipe = build_pipeline(df)
    t0 = time.perf_counter()
    out = pipe.fit_transform(df)
    out.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    print(f"[{name}] fit_transform over {table}@{sf_dir}: "
          f"{out.count()} rows x {len(out.columns)} cols in {elapsed:.2f}s")
    out.show(5, truncate=14)
    if explain or os.environ.get("DFP_EXPLAIN"):
        out.explain("formatted")
    spark.stop()
    return out


# -- parity gate (r10, VERDICT r9 #8) --------------------------------------
#
# `python examples/_runner.py --assert-parity` runs the FOUR
# reference-benchmark pipelines (fraud_detection / insurance /
# mental_health / categorical_encoding — the Spark re-expressions of
# /root/reference/benchmarks/*_1) at sf0.001 and asserts row count,
# column set, and a canonical value hash against the committed golden
# file — the CI mirror of the reference's run_unit_test.sh.  Regenerate
# goldens (after an INTENTIONAL semantics change) with
# DFP_GOLDEN_REWRITE=1.

PARITY_EXAMPLES = [
    ("fraud_detection", "lineitem"),
    ("insurance", "orders"),
    ("mental_health", "customer"),
    ("categorical_encoding", "part"),
]

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden_parity.json")


def _canon_cell(v):
    import datetime
    import math

    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return format(round(v, 6), ".6f")
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _frame_fingerprint(df):
    import hashlib

    cols = sorted(df.columns)
    rows = sorted("␟".join(_canon_cell(r[c]) for c in cols)
                  for r in df.collect())
    h = hashlib.sha256("␞".join(rows).encode()).hexdigest()
    return {"rows": len(rows), "cols": cols, "hash": h}


def assert_parity(sf_dir=None):
    import importlib
    import json

    sf_dir = sf_dir or DEFAULT_SF
    rewrite = bool(os.environ.get("DFP_GOLDEN_REWRITE"))
    golden = {}
    if not rewrite:
        with open(GOLDEN_PATH) as fh:
            golden = json.load(fh)
    spark = get_spark("examples-parity")
    got, failed = {}, []
    for name, table in PARITY_EXAMPLES:
        mod = importlib.import_module(name)
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if hasattr(mod, "prep"):
            df = mod.prep(df)
        out = mod.build(df).fit_transform(df)
        fp = _frame_fingerprint(out)
        got[name] = fp
        if rewrite:
            print(f"[golden] {name}: {fp['rows']} rows, {len(fp['cols'])} "
                  f"cols, {fp['hash'][:12]}…")
        elif fp != golden.get(name):
            failed.append(name)
            print(f"[FAIL] {name}: got {fp}\n       want {golden.get(name)}")
        else:
            print(f"[ok] {name}: {fp['rows']} rows, hash match")
    spark.stop()
    if rewrite:
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}")
        return 0
    if failed:
        print(f"PARITY FAILED: {failed}")
        return 1
    print(f"parity OK: {len(got)}/{len(PARITY_EXAMPLES)} pipelines match")
    return 0


if __name__ == "__main__":
    if "--assert-parity" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--assert-parity"]
        sys.exit(assert_parity(args[0] if args else None))
    print(__doc__)
