"""Sources & data-prep helpers: CSV schema read, joins, splits, sampling."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark import sources as src


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)],
        "id long, name string, v double")


def test_read_csv_with_schema(spark, tmp_path, frame):
    p = str(tmp_path / "t.csv")
    frame.write.option("header", "true").csv(p)
    out = src.read_csv(spark, p, schema="id long, name string, v double",
                       columns=["id", "v"])
    assert out.columns == ["id", "v"]
    assert out.schema["id"].dataType.typeName() == "long"
    assert out.count() == 20


def test_left_enrich_broadcast(spark, frame):
    dim = spark.createDataFrame([(0, "zero"), (1, "one")], "id long, label string")
    out = src.left_enrich(frame, dim, on="id")
    assert out.count() == 20
    assert out.filter(F.col("label").isNull()).count() == 18
    # the plan must broadcast the dim side
    assert "Broadcast" in out._jdf.queryExecution().executedPlan().toString()


def test_split_mod_partitions_everything(frame):
    train, test = src.split_mod(frame, key="id", modulus=4, test_residue=3)
    assert train.count() == 15 and test.count() == 5
    assert train.intersect(test).count() == 0


def test_split_positional_order(frame):
    train, test = src.split_positional(frame, order_by="id", train_frac=0.75)
    assert train.count() == 15 and test.count() == 5
    assert train.agg(F.max("id")).first()[0] == 14
    assert test.agg(F.min("id")).first()[0] == 15


def test_sample_deterministic(frame):
    a = sorted(r.id for r in src.sample_rows(frame, 0.5, seed=7).collect())
    b = sorted(r.id for r in src.sample_rows(frame, 0.5, seed=7).collect())
    assert a == b


def test_salted_join_equals_plain(spark):
    from pyspark.sql import functions as F
    from dataframe_pipeline_spark.sources import salted_join

    fact = spark.range(1000).select((F.col("id") % 3).alias("k"), "id")
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, v string")
    got = salted_join(fact, dim, on="k").orderBy("id")
    exp = fact.join(dim, "k").orderBy("id")
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in exp.collect()]


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key: plan has no Exchange."""
    from pyspark.sql import functions as F
    from dataframe_pipeline_spark.sources import write_bucketed

    a = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    write_bucketed(a, "bt_a", str(tmp_path / "bt_a"), "k", n_buckets=4, sort_by="k")
    write_bucketed(b, "bt_b", str(tmp_path / "bt_b"), "k", n_buckets=4, sort_by="k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = spark.table("bt_a"), spark.table("bt_b")
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located sort-merge join: bucketed scans, zero shuffle
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_write_partitioned_prunes(spark, tmp_path):
    from pyspark.sql import functions as F
    from dataframe_pipeline_spark.sources import write_partitioned

    df = spark.range(100).select((F.col("id") % 4).alias("p"), "id")
    write_partitioned(df, str(tmp_path / "pt"), ["p"])
    rd = spark.read.parquet(str(tmp_path / "pt")).filter(F.col("p") == 2)
    assert rd.count() == 25
    scan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in scan or "p#" in scan
    # pre-write shuffle bounds file count: each partition directory is
    # written by the task(s) owning that hash bucket, not by every task
    # (P×T small files without it)
    import glob
    for d in glob.glob(str(tmp_path / "pt" / "p=*")):
        files = glob.glob(d + "/*.parquet")
        assert len(files) <= 2, (d, files)


def test_json_roundtrip(spark, tmp_path):
    import pandas as pd
    from dataframe_pipeline_spark.sources import read_json, write_csv

    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    df.write.json(str(tmp_path / "j"))
    rd = read_json(spark, str(tmp_path / "j"), schema="a long, b string")
    assert sorted((r.a, r.b) for r in rd.collect()) == [(1, "x"), (2, "y")]
    write_csv(df, str(tmp_path / "c"))
    back = spark.read.option("header", "true").csv(str(tmp_path / "c"))
    assert sorted(r.b for r in back.collect()) == ["x", "y"]


def test_weighted_sample_deterministic_and_nested(spark):
    """Per-stratum rates hold approximately; the kept set is a pure
    function of the data (stable under repartitioning), and raising a
    rate only ADDS rows (nested samples — the property that lets a
    pipeline re-mix domains without resampling from scratch)."""
    from dataframe_pipeline_spark.sources import weighted_sample

    od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    rates = {"1-URGENT": 0.5, "2-HIGH": 0.1}
    out = weighted_sample(od, "o_orderpriority", rates,
                          key="o_orderkey", default_rate=0.02)
    kept = {r.o_orderkey for r in out.select("o_orderkey").collect()}
    kept_repart = {r.o_orderkey for r in
                   weighted_sample(od.repartition(13), "o_orderpriority",
                                   rates, key="o_orderkey",
                                   default_rate=0.02)
                   .select("o_orderkey").collect()}
    assert kept == kept_repart

    by_prio = {r.o_orderpriority: r.cnt for r in
               out.groupBy("o_orderpriority")
               .agg(F.count("*").alias("cnt")).collect()}
    totals = {r.o_orderpriority: r.cnt for r in
              od.groupBy("o_orderpriority")
              .agg(F.count("*").alias("cnt")).collect()}
    assert abs(by_prio["1-URGENT"] / totals["1-URGENT"] - 0.5) < 0.05
    assert abs(by_prio["2-HIGH"] / totals["2-HIGH"] - 0.1) < 0.05

    bigger = weighted_sample(od, "o_orderpriority",
                             {"1-URGENT": 0.8, "2-HIGH": 0.3},
                             key="o_orderkey", default_rate=0.05)
    kept_big = {r.o_orderkey for r in bigger.select("o_orderkey").collect()}
    assert kept <= kept_big


def test_split_by_group_leakage_safe(spark):
    """Every group lands wholly on one side; the two sides partition the
    frame; membership is partitioning-independent; growing test_frac
    nests (old test groups stay test groups)."""
    from dataframe_pipeline_spark.sources import split_by_group

    od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    train, test = split_by_group(od, "o_custkey", test_frac=0.25)

    tr_groups = {r.o_custkey for r in
                 train.select("o_custkey").distinct().collect()}
    te_groups = {r.o_custkey for r in
                 test.select("o_custkey").distinct().collect()}
    assert tr_groups.isdisjoint(te_groups)
    assert train.count() + test.count() == od.count()
    # approximate rate over GROUPS (not rows)
    frac = len(te_groups) / (len(te_groups) + len(tr_groups))
    assert abs(frac - 0.25) < 0.05

    # partitioning-independent
    _, test2 = split_by_group(od.repartition(17), "o_custkey",
                              test_frac=0.25)
    assert {r.o_orderkey for r in test2.select("o_orderkey").collect()} \
        == {r.o_orderkey for r in test.select("o_orderkey").collect()}

    # nested: a bigger test fraction only ADDS groups
    _, test_big = split_by_group(od, "o_custkey", test_frac=0.5)
    te_big = {r.o_custkey for r in
              test_big.select("o_custkey").distinct().collect()}
    assert te_groups <= te_big

    with pytest.raises(ValueError):
        split_by_group(od, "o_custkey", test_frac=1.5)


def test_cap_per_group_quota_and_determinism(spark):
    """At most k rows per group; kept set is a pure function of the
    data (stable under repartitioning); groups under quota untouched."""
    from dataframe_pipeline_spark.sources import cap_per_group

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    capped = cap_per_group(docs, "source", "doc_id", 7)
    per = {r.source: r.cnt for r in
           capped.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert per and all(c <= 7 for c in per.values())

    totals = {r.source: r.cnt for r in
              docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    for s, c in totals.items():
        assert per.get(s, 0) == min(c, 7)

    a = {r.doc_id for r in capped.select("doc_id").collect()}
    b = {r.doc_id for r in
         cap_per_group(docs.repartition(13), "source", "doc_id", 7)
         .select("doc_id").collect()}
    assert a == b

    with pytest.raises(ValueError):
        cap_per_group(docs, "source", "doc_id", 0)


def test_orc_roundtrip(spark, tmp_path):
    from dataframe_pipeline_spark.sources import read_orc, write_orc
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p, columns=["v"])
    assert back.columns == ["v"]
    assert sorted(r.v for r in back.collect()) == [2 * i for i in range(100)]


def test_parquet_schema_evolution(spark, tmp_path):
    from dataframe_pipeline_spark.sources import read_parquet_evolved
    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "a")], "id long, name string") \
        .write.parquet(v1)
    spark.createDataFrame([(2, "b", 9.5)],
                          "id long, name string, score double") \
        .write.parquet(v2)
    df = read_parquet_evolved(spark, [v1, v2])
    assert set(df.columns) == {"id", "name", "score"}
    got = {r.id: r.score for r in df.collect()}
    assert got[1] is None and got[2] == 9.5   # old files NULL new column


def test_stopword_remover(spark):
    from dataframe_pipeline_spark.text import StopwordRemover
    df = spark.createDataFrame(
        [(1, "the cat the cat sat"), (2, "dogs run")],
        "doc_id long, text string")
    out = {r.doc_id: r.text
           for r in StopwordRemover(["the"]).transform(df).collect()}
    # duplicates among surviving tokens preserved (not a set op)
    assert out[1] == "cat cat sat"
    assert out[2] == "dogs run"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        StopwordRemover([])


def test_write_range_sorted_global_order(spark, tmp_path):
    """Files carry contiguous, non-overlapping ranges and each file is
    internally sorted -> total order across the dataset, no
    single-partition sort."""
    import glob

    import pyarrow.parquet as pq

    from dataframe_pipeline_spark.sources import write_range_sorted
    df = spark.range(10000).selectExpr("id", "id % 97 AS v") \
        .orderBy(F.rand(7))                      # destroy input order
    p = str(tmp_path / "ranged")
    write_range_sorted(df, p, "id", n_files=4)
    files = sorted(glob.glob(f"{p}/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["id"]).column("id").to_pylist()
        assert t == sorted(t)                    # sorted within file
        ranges.append((t[0], t[-1]))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo                       # non-overlapping ranges
    total = sorted(x for lo_hi in ranges for x in lo_hi)
    assert total[0] == 0 and total[-1] == 9999


def test_split_temporal_embargo(spark):
    from dataframe_pipeline_spark.sources import split_temporal
    rows = [(i, f"2024-01-{d:02d} 00:00:00") for i, d in
            enumerate([1, 5, 9, 10, 11, 15], 1)]
    df = spark.createDataFrame(rows, "id long, ts string") \
        .selectExpr("id", "cast(ts as timestamp) ts")
    train, test = split_temporal(df, "ts", "2024-01-10", embargo="2 days")
    assert sorted(r.id for r in train.collect()) == [1, 2]   # < Jan 8
    assert sorted(r.id for r in test.collect()) == [4, 5, 6]  # >= Jan 10
    # id 3 (Jan 9) embargoed: in NEITHER side
    tr2, te2 = split_temporal(df, "ts", "2024-01-10")
    assert sorted(r.id for r in tr2.collect()) == [1, 2, 3]   # no embargo
    assert sorted(r.id for r in te2.collect()) == [4, 5, 6]


def test_compact_parquet(spark, tmp_path):
    import glob

    from dataframe_pipeline_spark.sources import compact_parquet
    src = str(tmp_path / "fragmented")
    # 64 tiny files
    spark.range(10000).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_mb=128)
    files = glob.glob(f"{out}/part-*.parquet")
    assert n == 1 and len(files) == 1              # KBs -> one file
    assert spark.read.parquet(out).count() == 10000


def test_temperature_mixture_shares_and_determinism(spark):
    """alpha=0 gives ~uniform per-source keeps, alpha=1 keeps natural
    proportions; the kept set is partitioning-independent; alpha
    between up-samples small sources relative to natural sampling."""
    from dataframe_pipeline_spark.sources import temperature_mixture

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    total = docs.count()

    out = temperature_mixture(docs, "source", key="doc_id",
                              target_rows=250, alpha=0.5)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    kept_repart = {r.doc_id for r in
                   temperature_mixture(docs.repartition(13), "source",
                                       key="doc_id", target_rows=250,
                                       alpha=0.5)
                   .select("doc_id").collect()}
    assert kept == kept_repart
    # target is approximate (per-row md5 thinning) but must be in range
    assert 0.3 * 250 < len(kept) < 1.7 * 250

    # alpha=1 == plain uniform thinning: every source keeps ~the same
    # FRACTION of its rows (rate = target/total for all sources)
    nat = temperature_mixture(docs, "source", key="doc_id",
                              target_rows=250, alpha=1.0)
    rates = {r.source: r.cnt for r in
             nat.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    sizes = {r.source: r.cnt for r in
             docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    # every kept fraction within crude binomial noise of target/total
    for s, n in sizes.items():
        frac = rates.get(s, 0) / n
        assert abs(frac - 250 / total) < 0.35

    with pytest.raises(ValueError):
        temperature_mixture(docs, "source", key="doc_id", target_rows=-1)


def test_assign_shards_balanced_stable_and_ordered(spark):
    """Shard ids are a pure function of the key (stable under
    repartitioning), cover [0, n), are roughly balanced, and the
    position column is a dense 1..k md5-rank within each shard."""
    from dataframe_pipeline_spark.sources import assign_shards

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = assign_shards(docs, key="doc_id", n_shards=8,
                        position_col="position")
    rows = out.select("doc_id", "shard", "position").collect()
    by_id = {r.doc_id: (r.shard, r.position) for r in rows}
    rows2 = assign_shards(docs.repartition(13), key="doc_id", n_shards=8,
                          position_col="position") \
        .select("doc_id", "shard", "position").collect()
    assert {r.doc_id: (r.shard, r.position) for r in rows2} == by_id

    import collections
    sizes = collections.Counter(s for s, _ in by_id.values())
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) < 2.5 * min(sizes.values())
    # dense positions 1..k per shard
    per_shard = collections.defaultdict(list)
    for s, p in by_id.values():
        per_shard[s].append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))

    with pytest.raises(ValueError):
        assign_shards(docs, key="doc_id", n_shards=0)


def test_zorder_key_locality_and_determinism(spark):
    """The Morton key is a pure function of the data (stable under
    repartitioning), stays JVM-side (no Python eval in the plan), and
    delivers multi-dimensional locality: sorting by zkey brings rows
    close in BOTH dimensions, so per-chunk min/max ranges of each
    column are far narrower than the global range."""
    from dataframe_pipeline_spark.sources import zorder_key

    od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    out = zorder_key(od, ["o_custkey", "o_totalprice"], bits=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    rows = out.select("o_orderkey", "o_custkey", "o_totalprice", "zkey") \
        .collect()
    keyed = {r.o_orderkey: r.zkey for r in rows}
    rows2 = zorder_key(od.repartition(13), ["o_custkey", "o_totalprice"],
                       bits=8).select("o_orderkey", "zkey").collect()
    assert {r.o_orderkey: r.zkey for r in rows2} == keyed

    # locality: split the zkey-sorted rows into 64 chunks; the average
    # per-chunk span of EACH column must be well under the global span
    srt = sorted(rows, key=lambda r: (r.zkey, r.o_orderkey))
    n = len(srt)
    chunk = max(1, n // 64)
    for col in ("o_custkey", "o_totalprice"):
        glob = (max(getattr(r, col) for r in srt)
                - min(getattr(r, col) for r in srt))
        spans = []
        for i in range(0, n - chunk + 1, chunk):
            vals = [getattr(r, col) for r in srt[i:i + chunk]]
            spans.append(max(vals) - min(vals))
        assert sum(spans) / len(spans) < 0.5 * glob, col

    with pytest.raises(ValueError):
        zorder_key(od, ["o_custkey"])
    with pytest.raises(ValueError):
        zorder_key(od, ["o_custkey", "o_totalprice"], bits=32)


def test_write_zordered_roundtrip_skipping(spark, tmp_path):
    """write_zordered preserves content exactly, and a range filter on
    either clustered column is pushed to the parquet scan (where row-
    group min/max stats can act on the clustered layout)."""
    from dataframe_pipeline_spark.sources import write_zordered

    od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    path = str(tmp_path / "orders_z")
    write_zordered(od, path, ["o_custkey", "o_totalprice"], bits=8)
    back = spark.read.parquet(path)
    assert back.count() == od.count()
    assert (sorted(r.o_orderkey for r in back.select("o_orderkey").collect())
            == sorted(r.o_orderkey for r in od.select("o_orderkey").collect()))
    assert "zkey" not in back.columns and "__zkey" not in back.columns
    for pred in (F.col("o_custkey") < 100, F.col("o_totalprice") < 5000.0):
        plan = (back.filter(pred)._jdf.queryExecution()
                .executedPlan().toString())
        assert "PushedFilters: [" in plan and "LessThan" in plan


def test_fixed_sample_exact_k_nested_and_partition_invariant(spark):
    from dataframe_pipeline_spark.sources import fixed_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k50 = {r["doc_id"] for r in fixed_sample(docs, "doc_id", 50).collect()}
    k200 = {r["doc_id"] for r in fixed_sample(docs, "doc_id", 200).collect()}
    assert len(k50) == 50 and len(k200) == 200
    assert k50 <= k200                      # nested for growing k
    k50b = {r["doc_id"] for r in
            fixed_sample(docs.repartition(13), "doc_id", 50).collect()}
    assert k50 == k50b                      # content-addressed
    # k >= n degrades to the whole frame
    assert fixed_sample(docs, "doc_id", 10**6).count() == docs.count()
    import pytest as _pt
    with _pt.raises(ValueError):
        fixed_sample(docs, "doc_id", 0)


def test_fixed_sample_plan_is_take_ordered(spark):
    from dataframe_pipeline_spark.sources import fixed_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = fixed_sample(docs, "doc_id", 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan   # k-heaps, not a global sort
