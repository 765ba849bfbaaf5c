"""Declared correctness queries: one per operator from SURVEY.md §2.

Each entry pairs a Spark implementation (built from this package's
operators) with an ANSI-SQL oracle that DuckDB runs on the same parquet
tables.  Column names and types are aligned on both sides; any value
derived from an aggregate statistic is rounded to 6 decimals on BOTH sides
so engine-internal summation order can't flip the value hash.

Conventions:
- every callable has signature (spark, sf_dir) -> DataFrame
- tables: region nation customer supplier part orders lineitem events
  documents embeddings (parquet under sf_dir)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import operators as ops


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    return df.withColumns({c: F.round(F.col(c), 6) for c in cols})


# ---------------------------------------------------------------------------
# Aggregator
# ---------------------------------------------------------------------------

def q_agg_global_mean(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    agg = ops.Aggregator(inputs=["l_extendedprice"], outputs=["price_mean"], func="mean")
    out = agg.fit_transform(li)
    return _r6(out.select("l_orderkey", "l_linenumber", "price_mean"), "price_mean")


SQL_AGG_GLOBAL_MEAN = """
SELECT l_orderkey, l_linenumber,
       ROUND((SELECT avg(l_extendedprice) FROM lineitem), 6) AS price_mean
FROM lineitem
"""


def q_agg_group_mean(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    agg = ops.Aggregator(inputs=["l_extendedprice"], outputs=["price_mean_supp"],
                         groupby=["l_suppkey"], func="mean")
    out = agg.fit_transform(li)
    return _r6(out.select("l_orderkey", "l_linenumber", "price_mean_supp"), "price_mean_supp")


SQL_AGG_GROUP_MEAN = """
SELECT l_orderkey, l_linenumber,
       ROUND(avg(l_extendedprice) OVER (PARTITION BY l_suppkey), 6) AS price_mean_supp
FROM lineitem
"""


def q_agg_group_std(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    agg = ops.Aggregator(inputs=["l_extendedprice"], outputs=["price_std_supp"],
                         groupby=["l_suppkey"], func="std")
    out = agg.fit_transform(li)
    return _r6(out.select("l_orderkey", "l_linenumber", "price_std_supp"), "price_std_supp")


SQL_AGG_GROUP_STD = """
SELECT l_orderkey, l_linenumber,
       ROUND(stddev_samp(l_extendedprice) OVER (PARTITION BY l_suppkey), 6) AS price_std_supp
FROM lineitem
"""


def q_agg_group_median(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    agg = ops.Aggregator(inputs=["l_extendedprice"], outputs=["price_med_supp"],
                         groupby=["l_suppkey"], func="median")
    out = agg.fit_transform(li)
    return _r6(out.select("l_orderkey", "l_linenumber", "price_med_supp"),
               "price_med_supp")


# exact interpolated median (pandas semantics), not percentile_approx
SQL_AGG_GROUP_MEDIAN = """
SELECT l_orderkey, l_linenumber,
       ROUND(median(l_extendedprice) OVER (PARTITION BY l_suppkey), 6)
         AS price_med_supp
FROM lineitem
"""


def q_agg_group_nunique(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    agg = ops.Aggregator(inputs=["l_partkey"], outputs=["parts_per_supp"],
                         groupby=["l_suppkey"], func="nunique")
    return agg.fit_transform(li).select("l_orderkey", "l_linenumber",
                                        "parts_per_supp")


SQL_AGG_GROUP_NUNIQUE = """
SELECT l.l_orderkey, l.l_linenumber, g.parts_per_supp
FROM lineitem l
JOIN (SELECT l_suppkey, count(DISTINCT l_partkey) AS parts_per_supp
      FROM lineitem GROUP BY l_suppkey) g
  ON l.l_suppkey = g.l_suppkey
"""


# ---------------------------------------------------------------------------
# FrequencyEncoder
# ---------------------------------------------------------------------------

def q_freq_count(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    fe = ops.FrequencyEncoder(inputs=["c_nationkey"], outputs=["nation_freq"])
    return fe.fit_transform(cu).select("c_custkey", "c_nationkey", "nation_freq")


SQL_FREQ_COUNT = """
SELECT c_custkey, c_nationkey,
       COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_freq
FROM customer
"""


def q_freq_norm(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    fe = ops.FrequencyEncoder(inputs=["c_nationkey"], outputs=["nation_freq"], normalize=True)
    out = fe.fit_transform(cu)
    return _r6(out.select("c_custkey", "c_nationkey", "nation_freq"), "nation_freq")


SQL_FREQ_NORM = """
SELECT c_custkey, c_nationkey,
       ROUND(COUNT(*) OVER (PARTITION BY c_nationkey) * 1.0
             / COUNT(*) OVER (), 6) AS nation_freq
FROM customer
"""


# ---------------------------------------------------------------------------
# ComplementLabelEncoder / WrapTransformer(LabelEncoder)
# ---------------------------------------------------------------------------

def q_label_encode(spark, sf_dir):
    od = _t(spark, sf_dir, "orders")
    le = ops.ComplementLabelEncoder(inputs=["o_orderpriority"], outputs=["prio_code"])
    return le.fit_transform(od).select("o_orderkey", "prio_code")


# 'extra_category_' sorts after the digit-prefixed priorities, so fitted ids
# equal dense_rank-1 over the present values.
SQL_LABEL_ENCODE = """
SELECT o_orderkey,
       CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER) AS prio_code
FROM orders
"""


def q_wrap_label_encode(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")

    class LabelEncoder:  # sklearn-shaped marker; recognized by class name
        pass

    w = ops.WrapTransformer(inputs=["c_mktsegment"], outputs=["seg_code"],
                            transformer=LabelEncoder())
    return w.fit_transform(cu).select("c_custkey", "seg_code")


SQL_WRAP_LABEL_ENCODE = """
SELECT c_custkey,
       CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INTEGER) AS seg_code
FROM customer
"""


# ---------------------------------------------------------------------------
# OneHotEncoder
# ---------------------------------------------------------------------------

def q_onehot(spark, sf_dir):
    od = _t(spark, sf_dir, "orders")
    oh = ops.OneHotEncoder(columns=["o_orderstatus"])
    out = oh.fit_transform(od)
    keep = ["o_orderkey"] + [c for c in out.columns if c.startswith("o_orderstatus__")]
    return out.select(*keep)


SQL_ONEHOT = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS "o_orderstatus__F",
       CASE WHEN o_orderstatus = 'O' THEN 1.0 ELSE 0.0 END AS "o_orderstatus__O",
       CASE WHEN o_orderstatus = 'P' THEN 1.0 ELSE 0.0 END AS "o_orderstatus__P"
FROM orders
"""


# ---------------------------------------------------------------------------
# DateTransformer
# ---------------------------------------------------------------------------

def q_date_features(spark, sf_dir):
    od = _t(spark, sf_dir, "orders")
    dt = ops.DateTransformer(column="o_orderdate")
    out = dt.fit_transform(od)
    return out.select(
        "o_orderkey", "o_orderdate_MY", "o_orderdate_WY", "o_orderdate_DY",
        "o_orderdate_DM", "o_orderdate_DW", "o_orderdate_HD",
    )


SQL_DATE_FEATURES = """
SELECT o_orderkey,
       month(o_orderdate)                 AS o_orderdate_MY,
       weekofyear(o_orderdate)            AS o_orderdate_WY,
       dayofyear(o_orderdate)             AS o_orderdate_DY,
       day(o_orderdate)                   AS o_orderdate_DM,
       (dayofweek(o_orderdate) + 6) % 7   AS o_orderdate_DW,
       hour(o_orderdate)                  AS o_orderdate_HD
FROM orders
"""


def q_date_from_seconds(spark, sf_dir):
    """origin mode: integer epoch-second offsets against a fixed origin
    (reference DateTransformer.py to_datetime(unit='s', origin=...))."""
    od = _t(spark, sf_dir, "orders")
    od = od.withColumn("secs", (F.col("o_orderkey") % 31_536_000).cast("long"))
    dt = ops.DateTransformer(column="secs", origin="2017-11-30")
    out = dt.fit_transform(od)
    return out.select("o_orderkey", "secs_MY", "secs_DY", "secs_DW", "secs_HD")


SQL_DATE_FROM_SECONDS = """
WITH b AS (
  SELECT o_orderkey,
         TIMESTAMP '2017-11-30' + to_seconds(o_orderkey % 31536000) AS t
  FROM orders)
SELECT o_orderkey,
       month(t)                 AS secs_MY,
       dayofyear(t)             AS secs_DY,
       (dayofweek(t) + 6) % 7   AS secs_DW,
       hour(t)                  AS secs_HD
FROM b
"""


def q_map_regex(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    m = ops.MapTransformer(inputs=["c_mktsegment"], outputs=["seg_re"],
                           dict={"BUILD": "BLD", "MOB": "M"}, regex=True)
    return m.fit_transform(cu).select("c_custkey", "seg_re")


SQL_MAP_REGEX = """
SELECT c_custkey,
       regexp_replace(regexp_replace(c_mktsegment, 'BUILD', 'BLD', 'g'),
                      'MOB', 'M', 'g') AS seg_re
FROM customer
"""


# ---------------------------------------------------------------------------
# Imputer (transform-time statistics — oracle recomputes on the same frame)
# ---------------------------------------------------------------------------

def _with_synth_nulls(cu: DataFrame) -> DataFrame:
    # testdata has no NULLs; synthesize them deterministically
    return cu.withColumn(
        "acct",
        F.when(F.col("c_custkey") % 10 == 0, F.lit(None)).otherwise(F.col("c_acctbal")),
    )


_SQL_SYNTH_NULLS = (
    "SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS acct "
    "FROM customer"
)


def q_imputer_mean(spark, sf_dir):
    cu = _with_synth_nulls(_t(spark, sf_dir, "customer"))
    im = ops.Imputer(inputs=["acct"], outputs=["acct_filled"], strategy="mean")
    out = im.fit_transform(cu)
    return _r6(out.select("c_custkey", "acct_filled"), "acct_filled")


SQL_IMPUTER_MEAN = f"""
WITH base AS ({_SQL_SYNTH_NULLS})
SELECT c_custkey,
       ROUND(coalesce(acct, (SELECT avg(acct) FROM base)), 6) AS acct_filled
FROM base
"""


def q_imputer_median(spark, sf_dir):
    cu = _with_synth_nulls(_t(spark, sf_dir, "customer"))
    im = ops.Imputer(inputs=["acct"], outputs=["acct_filled"], strategy="median")
    out = im.fit_transform(cu)
    return _r6(out.select("c_custkey", "acct_filled"), "acct_filled")


SQL_IMPUTER_MEDIAN = f"""
WITH base AS ({_SQL_SYNTH_NULLS})
SELECT c_custkey,
       ROUND(coalesce(acct, (SELECT median(acct) FROM base)), 6) AS acct_filled
FROM base
"""


def q_imputer_const(spark, sf_dir):
    cu = _with_synth_nulls(_t(spark, sf_dir, "customer"))
    im = ops.Imputer(inputs=["acct"], outputs=["acct_filled"], val=-1.0)
    return im.fit_transform(cu).select("c_custkey", "acct_filled")


SQL_IMPUTER_CONST = f"""
WITH base AS ({_SQL_SYNTH_NULLS})
SELECT c_custkey, coalesce(acct, -1.0) AS acct_filled
FROM base
"""


# ---------------------------------------------------------------------------
# MapTransformer
# ---------------------------------------------------------------------------

def q_map_default(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    m = ops.MapTransformer(
        inputs=["c_mktsegment"], outputs=["seg"],
        dict={"BUILDING": "B", "AUTOMOBILE": "A"}, default_value="OTHER",
    )
    return m.fit_transform(cu).select("c_custkey", "seg")


SQL_MAP_DEFAULT = """
SELECT c_custkey,
       CASE WHEN c_mktsegment = 'BUILDING' THEN 'B'
            WHEN c_mktsegment = 'AUTOMOBILE' THEN 'A'
            ELSE 'OTHER' END AS seg
FROM customer
"""


# ---------------------------------------------------------------------------
# MinorityTransformer (transform-time counts)
# ---------------------------------------------------------------------------

def q_minority(spark, sf_dir):
    pt = _t(spark, sf_dir, "part")
    m = ops.MinorityTransformer(inputs=["p_brand"], outputs=["brand_grp"],
                                threshold=5, replaced_to="OTHER")
    return m.fit_transform(pt).select("p_partkey", "brand_grp")


SQL_MINORITY = """
SELECT p_partkey,
       CASE WHEN COUNT(*) OVER (PARTITION BY p_brand) >= 5
            THEN p_brand ELSE 'OTHER' END AS brand_grp
FROM part
"""


# ---------------------------------------------------------------------------
# RangeTransformer (transform-time stats, last-match-wins)
# ---------------------------------------------------------------------------

def q_range_transform(spark, sf_dir):
    pt = _t(spark, sf_dir, "part")
    r = ops.RangeTransformer(
        inputs=["p_retailprice"], outputs=["price_clamped"],
        dict={(None, 1500.0): 1500.0, (600.0, None): 600.0, (1200.0, 800.0): "mean"},
    )
    out = r.fit_transform(pt)
    return _r6(out.select("p_partkey", "price_clamped"), "price_clamped")


# Reverse order in the CASE: the last dict entry wins in the reference.
SQL_RANGE_TRANSFORM = """
SELECT p_partkey,
       ROUND(CASE
         WHEN p_retailprice BETWEEN 800.0 AND 1200.0
           THEN (SELECT avg(p_retailprice) FROM part
                 WHERE p_retailprice BETWEEN 800.0 AND 1200.0)
         WHEN p_retailprice <= 600.0 THEN 600.0
         WHEN p_retailprice >= 1500.0 THEN 1500.0
         ELSE p_retailprice END, 6) AS price_clamped
FROM part
"""


# ---------------------------------------------------------------------------
# RowTransformer
# ---------------------------------------------------------------------------

def q_row_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    r = ops.RowTransformer(columns=["l_returnflag"], drop_values=["R"])
    return r.fit_transform(li).select("l_orderkey", "l_linenumber", "l_returnflag")


SQL_ROW_FILTER = """
SELECT l_orderkey, l_linenumber, l_returnflag
FROM lineitem
WHERE l_returnflag NOT IN ('R')
"""


# ---------------------------------------------------------------------------
# Scaler
# ---------------------------------------------------------------------------

def q_scaler_minmax(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    s = ops.Scaler(inputs=["c_acctbal"], outputs=["acct_mm"], strategy="minmax")
    out = s.fit_transform(cu)
    return _r6(out.select("c_custkey", "acct_mm"), "acct_mm")


SQL_SCALER_MINMAX = """
SELECT c_custkey,
       ROUND((c_acctbal - (SELECT min(c_acctbal) FROM customer))
             * (1.0 / ((SELECT max(c_acctbal) FROM customer)
                       - (SELECT min(c_acctbal) FROM customer))), 6) AS acct_mm
FROM customer
"""


def q_scaler_standard(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    s = ops.Scaler(inputs=["c_acctbal"], outputs=["acct_std"], strategy="standard")
    out = s.fit_transform(cu)
    return _r6(out.select("c_custkey", "acct_std"), "acct_std")


SQL_SCALER_STANDARD = """
SELECT c_custkey,
       ROUND((c_acctbal - (SELECT avg(c_acctbal) FROM customer))
             * (1.0 / (SELECT stddev_pop(c_acctbal) FROM customer)), 6) AS acct_std
FROM customer
"""


def q_scaler_min(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    s = ops.Scaler(inputs=["c_acctbal"], outputs=["acct_rel"], strategy="min")
    out = s.fit_transform(cu)
    return _r6(out.select("c_custkey", "acct_rel"), "acct_rel")


SQL_SCALER_MIN = """
SELECT c_custkey,
       ROUND(c_acctbal - (SELECT min(c_acctbal) FROM customer), 6) AS acct_rel
FROM customer
"""


# ---------------------------------------------------------------------------
# StringConcatenator / StringSplitter / TypeConverter / ColumnSelector
# ---------------------------------------------------------------------------

def q_strconcat(spark, sf_dir):
    pt = _t(spark, sf_dir, "part")
    c = ops.StringConcatenator(inputs=[("p_brand", "p_retailprice")],
                               outputs=["brand_price"], separator="_")
    return c.fit_transform(pt).select("p_partkey", "brand_price")


# rtrim(s, '0') / rtrim(s, '.') strip character SETS — identical to Python
# rstrip, reproducing the reference's float-string quirk on both sides.
SQL_STRCONCAT = """
SELECT p_partkey,
       rtrim(rtrim(p_brand, '0'), '.') || '_' ||
       rtrim(rtrim(CAST(p_retailprice AS VARCHAR), '0'), '.') AS brand_price
FROM part
"""


def q_strsplit_sep(spark, sf_dir):
    pt = _t(spark, sf_dir, "part")
    s1 = ops.StringSplitter(inputs=["p_name"], outputs=["name_first"], separator=" ", keep=0)
    s2 = ops.StringSplitter(inputs=["p_name"], outputs=["name_last"], separator=" ", keep=-1)
    return s2.fit_transform(s1.fit_transform(pt)).select("p_partkey", "name_first", "name_last")


SQL_STRSPLIT_SEP = """
SELECT p_partkey,
       split_part(p_name, ' ', 1)  AS name_first,
       split_part(p_name, ' ', -1) AS name_last
FROM part
"""


def q_strsplit_index(spark, sf_dir):
    pt = _t(spark, sf_dir, "part")
    s1 = ops.StringSplitter(inputs=["p_name"], outputs=["name_pre"], index=4, keep=0)
    s2 = ops.StringSplitter(inputs=["p_name"], outputs=["name_suf"], index=4, keep=-1)
    return s2.fit_transform(s1.fit_transform(pt)).select("p_partkey", "name_pre", "name_suf")


SQL_STRSPLIT_INDEX = """
SELECT p_partkey,
       substring(p_name, 1, 4) AS name_pre,
       substring(p_name, 5)    AS name_suf
FROM part
"""


def q_typeconv(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    tc = ops.TypeConverter(columns=["l_partkey"], type=float)
    return (
        tc.fit_transform(li)
        .select("l_orderkey", "l_linenumber", F.col("l_partkey").alias("partkey_d"))
    )


SQL_TYPECONV = """
SELECT l_orderkey, l_linenumber, CAST(l_partkey AS DOUBLE) AS partkey_d
FROM lineitem
"""


def q_select(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    sel = ops.ColumnSelector(columns=["c_custkey", "c_name"])
    return sel.fit_transform(cu)


SQL_SELECT = "SELECT c_custkey, c_name FROM customer"


# ---------------------------------------------------------------------------
# SetTransformer (distributed set algebra; result as one-column frame)
# ---------------------------------------------------------------------------

def q_set_intersect(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    so = ops.SetTransformer(
        first_operand="c_mktsegment",
        second_operand=["BUILDING", "MACHINERY", "NOSUCHSEGMENT"],
        set_operation="*",
    )
    return so.result_df(cu).withColumnRenamed("__dfp_v", "v")


SQL_SET_INTERSECT = """
SELECT DISTINCT c_mktsegment AS v FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'NOSUCHSEGMENT')
"""


def q_set_diff(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    so = ops.SetTransformer(
        first_operand="c_mktsegment", second_operand=["BUILDING"], set_operation="-",
    )
    return so.result_df(cu).withColumnRenamed("__dfp_v", "v")


SQL_SET_DIFF = """
SELECT DISTINCT c_mktsegment AS v FROM customer
WHERE c_mktsegment NOT IN ('BUILDING')
"""


# ---------------------------------------------------------------------------
# FunctionTransformer (native tier and UDF tier)
# ---------------------------------------------------------------------------

def q_function_native(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    f = ops.FunctionTransformer(
        inputs=[("l_extendedprice", "l_discount")], outputs=["revenue"],
        func=lambda p, d: p * (1 - d),
    )
    return f.fit_transform(li).select("l_orderkey", "l_linenumber", "revenue")


SQL_FUNCTION_NATIVE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
"""


def q_function_udf(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    f = ops.FunctionTransformer(
        inputs=["l_extendedprice"], outputs=["cents"],
        func=lambda x: x - math.floor(x), returns=float,
    )
    return _r6(f.fit_transform(li).select("l_orderkey", "l_linenumber", "cents"), "cents")


SQL_FUNCTION_UDF = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice - floor(l_extendedprice), 6) AS cents
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Flagship multi-operator pipeline (also used by entry())
# ---------------------------------------------------------------------------

def q_pipeline_flagship(spark, sf_dir):
    """FraudDetection1-shaped pipeline over lineitem: lambda feature, label
    encode, grouped mean, min-max scale, string concat — one Catalyst plan."""
    from .pipeline import DataframePipeline

    li = _t(spark, sf_dir, "lineitem")
    pipe = DataframePipeline(steps=[
        ops.FunctionTransformer(inputs=[("l_extendedprice", "l_discount")],
                                outputs=["revenue"], func=lambda p, d: p * (1 - d)),
        ops.ComplementLabelEncoder(inputs=["l_returnflag"], outputs=["rf_code"]),
        # count, not mean: an exact integer aggregate keeps the flagship's
        # oracle hash deterministic (the float-mean path is oracle-checked
        # by agg_group_mean; FP summation order differs between engines at
        # the rounding boundary when embedded in a larger plan).
        ops.Aggregator(inputs=["l_extendedprice"], outputs=["supp_cnt"],
                       groupby=["l_suppkey"], func="count"),
        ops.Scaler(inputs=["l_quantity"], outputs=["qty_mm"], strategy="minmax"),
        ops.StringConcatenator(inputs=[("l_returnflag", "l_linestatus")],
                               outputs=["flag_status"], separator="_"),
    ])
    out = pipe.fit_transform(li)
    out = out.select("l_orderkey", "l_linenumber", "revenue", "rf_code",
                     "supp_cnt", "qty_mm", "flag_status")
    return _r6(out, "qty_mm")


SQL_PIPELINE_FLAGSHIP = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       CAST(dense_rank() OVER (ORDER BY l_returnflag) - 1 AS INTEGER) AS rf_code,
       count(*) OVER (PARTITION BY l_suppkey) AS supp_cnt,
       ROUND((l_quantity - (SELECT min(l_quantity) FROM lineitem))
             * (1.0 / ((SELECT max(l_quantity) FROM lineitem)
                       - (SELECT min(l_quantity) FROM lineitem))), 6) AS qty_mm,
       l_returnflag || '_' || l_linestatus AS flag_status
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

CORE_QUERIES = {
    "agg_global_mean": (q_agg_global_mean, SQL_AGG_GLOBAL_MEAN),
    "agg_group_mean": (q_agg_group_mean, SQL_AGG_GROUP_MEAN),
    "agg_group_std": (q_agg_group_std, SQL_AGG_GROUP_STD),
    "agg_group_median": (q_agg_group_median, SQL_AGG_GROUP_MEDIAN),
    "agg_group_nunique": (q_agg_group_nunique, SQL_AGG_GROUP_NUNIQUE),
    "freq_count": (q_freq_count, SQL_FREQ_COUNT),
    "freq_norm": (q_freq_norm, SQL_FREQ_NORM),
    "label_encode": (q_label_encode, SQL_LABEL_ENCODE),
    "wrap_label_encode": (q_wrap_label_encode, SQL_WRAP_LABEL_ENCODE),
    "onehot": (q_onehot, SQL_ONEHOT),
    "date_features": (q_date_features, SQL_DATE_FEATURES),
    "date_from_seconds": (q_date_from_seconds, SQL_DATE_FROM_SECONDS),
    "map_regex": (q_map_regex, SQL_MAP_REGEX),
    "imputer_mean": (q_imputer_mean, SQL_IMPUTER_MEAN),
    "imputer_median": (q_imputer_median, SQL_IMPUTER_MEDIAN),
    "imputer_const": (q_imputer_const, SQL_IMPUTER_CONST),
    "map_default": (q_map_default, SQL_MAP_DEFAULT),
    "minority": (q_minority, SQL_MINORITY),
    "range_transform": (q_range_transform, SQL_RANGE_TRANSFORM),
    "row_filter": (q_row_filter, SQL_ROW_FILTER),
    "scaler_minmax": (q_scaler_minmax, SQL_SCALER_MINMAX),
    "scaler_standard": (q_scaler_standard, SQL_SCALER_STANDARD),
    "scaler_min": (q_scaler_min, SQL_SCALER_MIN),
    "strconcat": (q_strconcat, SQL_STRCONCAT),
    "strsplit_sep": (q_strsplit_sep, SQL_STRSPLIT_SEP),
    "strsplit_index": (q_strsplit_index, SQL_STRSPLIT_INDEX),
    "typeconv": (q_typeconv, SQL_TYPECONV),
    "select": (q_select, SQL_SELECT),
    "set_intersect": (q_set_intersect, SQL_SET_INTERSECT),
    "set_diff": (q_set_diff, SQL_SET_DIFF),
    "function_native": (q_function_native, SQL_FUNCTION_NATIVE),
    "function_udf": (q_function_udf, SQL_FUNCTION_UDF),
    "pipeline_flagship": (q_pipeline_flagship, SQL_PIPELINE_FLAGSHIP),
}
