"""Side-by-side throughput: every oracle-checked query timed on Spark
(min of 2, noop sink) and on DuckDB (same SQL, same parquet, min of 2).

Usage: python scripts/bench_vs_duckdb.py [sf_dir] [query ...]
Prints one line per query: spark_s, duck_s, ratio — plus a summary.

Reading the ratios: sub-second Spark times measure fixed job-launch
overhead, not operator throughput (hence the >0.5s gate on the assert
list).  The fit-bearing queries (sim_ann_ivf*, pipeline_flagship,
wrap_*, models) run their full TRAINING loop inside the Spark timing,
while their DuckDB oracle replays pre-fitted literals — those ratios
compare fit+score against score-only by design (the oracle exists for
value parity, not symmetric work).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

#: Queries excluded BY NAME from the over-2x gate because their DuckDB
#: oracle does structurally less work than the Spark query by design —
#: an explicit allowlist (ADVICE r7: the old duck_s >= 0.05 time
#: threshold would also have silenced a genuine 10x regression on any
#: query whose oracle is legitimately fast).  Each entry names why the
#: comparison is asymmetric; anything NOT listed here trips the gate no
#: matter how fast DuckDB is.
ORACLE_ASYMMETRIC = {
    "text_bpe_merges": "oracle replays the PRE-FITTED merge table as "
                       "literals; Spark times the distributed trainer",
    "text_bpe_tokens": "same pre-fitted vocab replay",
    "text_unigram_tokens": "same pre-fitted vocab replay (unigram LM)",
    "text_unigram_vocab": "same pre-fitted vocab replay (unigram LM)",
    "events_user_totals": "Spark runs the Arrow stateful-twin kernel "
                          "(applyInPandas); oracle is a plain GROUP BY",
    "layout_pruned_scan": "Spark times WRITE(clustered layout)+pruned "
                          "read; oracle only reads",
    "profile_customer": "Spark times the pipeline fit + unpivot; "
                        "oracle is one trivial 1-row aggregate",
}

#: Documented quadratic BASELINE demos (VERDICT r7 #7): kept
#: hash-checked for correctness but excluded from the aggregate totals
#: and the gate — their linear-work scale twins (dedup_embedding_auto,
#: dedup_ngram_capped) are the rows that represent the engine.  The
#: same policy SCALE.md applies at sf3.
QUADRATIC_BASELINES = {
    "dedup_embedding_cosine": "fixed-planes all-pairs demo; scale twin "
                              "= dedup_embedding_auto",
    "dedup_ngram_jaccard": "uncapped n-gram pair join demo; scale twin "
                           "= dedup_ngram_capped",
}

#: Never RUN in a full-registry sweep above driver scale (still run
#: when named explicitly): the uncapped quadratic demos whose DUCKDB
#: oracle materializes the full pair join — at sf1 the 31-word-vocab
#: corpus makes every 3-gram shingle a stop-shingle, the spill exceeds
#: the disk, and the r8 sweep died on exactly that (the Spark side is
#: hash-checked at sf0.1 where both engines are bounded).  Standing
#: SCALE.md policy since r3.
RUN_SKIP_FULL_SWEEP = {"dedup_ngram_jaccard", "dedup_simhash_pairs"}


def main():
    argv = [a for a in sys.argv[1:] if a != "--assert"]
    do_assert = "--assert" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    only = set(argv[1:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql(sf_dir, names=only or None)
    names = [n for n in sorted(oracles) if not only or n in only]
    if not only:
        skip = set(RUN_SKIP_FULL_SWEEP)
        # extra per-invocation skips (e.g. the fixed-planes quadratic
        # demo at sf3+, SCALE.md policy): BENCH_VS_DUCK_SKIP=a,b
        skip |= {s for s in os.environ.get(
            "BENCH_VS_DUCK_SKIP", "").split(",") if s}
        skipped = [n for n in names if n in skip]
        names = [n for n in names if n not in skip]
        if skipped:
            print(f"skipping (full-sweep quadratic-oracle policy): "
                  f"{skipped}", flush=True)

    spark = get_spark("bench-vs-duck")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # Warm the Arrow PYTHON workers too (one trivial mapInPandas over
    # every core): without this, whichever codec/stateful-twin query
    # runs first is charged ~10s of worker spawn + numpy/pandas import
    # — at r8's sf3 sweep that inflated multimodal_gif_frames' ratio
    # 1.67x -> 2.18x while the steady-state kernel is scale-FLAT
    # (interleaved r9 measurement: sf1 2.0x, sf3 1.95x warm).
    def _noop(batches):
        yield from batches
    (spark.range(0, 1024, 1, 32)
     .mapInPandas(_noop, schema="id long").count())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rows = []
    for name in names:
        # Cold AND warm reported separately (VERDICT r12 #1): a row
        # whose fitted state is cached in-process (the sanctioned
        # *_persisted / sketch-literal-determinism rows) pays its fit
        # only on run 1 — min-of-N alone would silently report the warm
        # number.  cold = run 1, warm = best of the later runs; the
        # headline min stays min-of-all for cross-round comparability.
        s_runs, d_runs = [], []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            s_runs.append(time.perf_counter() - t0)
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            d_runs.append(time.perf_counter() - t0)
        s_best, d_best = min(s_runs), min(d_runs)
        s_cold, s_warm = s_runs[0], min(s_runs[1:])
        d_cold, d_warm = d_runs[0], min(d_runs[1:])
        ratio = s_best / d_best if d_best > 0 else None
        rows.append((name, s_best, d_best, ratio, s_cold, s_warm,
                     d_cold, d_warm))
        rtxt = f"{ratio:6.2f}x" if ratio is not None else "  n/a"
        print(f"{name:28s} spark={s_best:7.3f}s duck={d_best:7.3f}s "
              f"ratio={rtxt} (spark cold={s_cold:.3f} warm={s_warm:.3f}; "
              f"duck cold={d_cold:.3f} warm={d_warm:.3f})", flush=True)

    over = [r for r in rows
            if r[3] is not None and r[3] > 2.0 and r[1] > 0.5
            and r[0] not in ORACLE_ASYMMETRIC
            and r[0] not in QUADRATIC_BASELINES]
    in_total = [r for r in rows if r[0] not in QUADRATIC_BASELINES]
    print(f"\n{len(rows)} queries ({len(in_total)} in totals; "
          f"quadratic baselines excluded); spark total "
          f"{sum(r[1] for r in in_total):.1f}s, duckdb total "
          f"{sum(r[2] for r in in_total):.1f}s; "
          f">2x-and->0.5s: {[r[0] for r in over]}")
    out = os.environ.get("BENCH_VS_DUCK_OUT")
    if out:
        import json

        with open(out, "w") as fh:
            json.dump({
                "sf_dir": sf_dir,
                "spark_total_s": round(sum(r[1] for r in in_total), 3),
                "duckdb_total_s": round(sum(r[2] for r in in_total), 3),
                "over_2x_nontrivial": [r[0] for r in over],
                "excluded_quadratic_baselines": sorted(
                    n for n in QUADRATIC_BASELINES
                    if any(r[0] == n for r in rows)),
                "oracle_asymmetric_exempt": sorted(
                    n for n in ORACLE_ASYMMETRIC
                    if any(r[0] == n and r[3] is not None and r[3] > 2.0
                           for r in rows)),
                "queries": {r[0]: {"spark_s": round(r[1], 3),
                                   "duck_s": round(r[2], 3),
                                   "ratio": round(r[3], 2)
                                   if r[3] is not None else None,
                                   "spark_cold_s": round(r[4], 3),
                                   "spark_warm_s": round(r[5], 3),
                                   "duck_cold_s": round(r[6], 3),
                                   "duck_warm_s": round(r[7], 3)}
                            for r in rows},
            }, fh, indent=1, allow_nan=False)
        print(f"wrote {out}")
    spark.stop()
    if do_assert and over:
        # the ≤2x gate applies to non-trivial queries only (spark >0.5s):
        # sub-second queries measure Spark's fixed job-launch overhead,
        # not operator throughput
        print(f"ASSERT FAILED: {[r[0] for r in over]} exceed 2x DuckDB")
        sys.exit(1)


if __name__ == "__main__":
    main()
