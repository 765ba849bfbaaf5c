"""Sources & data-prep helpers.

The reference's data loading surface (CSV with forced dtypes / column
subsets, a left join of two frames, row sampling, a positional 3:1
train/test split — see /root/reference/benchmarks/fraud_detection_1/
FraudDetection1.py:86-112) re-expressed Spark-first.

Scale notes: explicit schemas (never ``inferSchema`` — that is a full
extra pass at 100 TB); column subsets via ``select`` so parquet scans
prune (`ReadSchema`) and CSV parsers skip fields; the *positional*
split exists for pandas parity but the scale-correct default is the
deterministic modulo/hash split, which needs no global sort and no
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_parquet(spark: SparkSession, path: str,
                 columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(spark: SparkSession, path: str, schema=None,
             columns: list[str] | None = None, **options) -> DataFrame:
    """CSV with an explicit schema (reference: pd.read_csv(dtype=...))."""
    reader = spark.read.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path, schema=schema) if schema is not None else \
        reader.option("inferSchema", "true").csv(path)
    return df.select(*columns) if columns else df


def left_enrich(fact: DataFrame, dim: DataFrame, on: str | list[str],
                broadcast_dim: bool = True) -> DataFrame:
    """The reference's data-prep left join (FraudDetection1.py:94):
    fact LEFT JOIN dim.  Small dims are broadcast so the join is
    shuffle-free on the fact side."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how="left")


def split_mod(df: DataFrame, key: str, modulus: int = 4,
              test_residue: int = 3) -> tuple[DataFrame, DataFrame]:
    """Deterministic, shuffle-free train/test split on a key column.

    The scale-correct analog of the reference's positional 3:1 split:
    every executor can evaluate membership locally.
    """
    is_test = (F.col(key) % modulus) == test_residue
    return df.filter(~is_test), df.filter(is_test)


def split_positional(df: DataFrame, order_by: str,
                     train_frac: float = 0.75) -> tuple[DataFrame, DataFrame]:
    """Positional split for exact pandas-iloc parity (first
    ``train_frac`` of rows in ``order_by`` order).

    Needs a global row numbering — an unavoidable single-partition
    window.  Kept for oracle parity at test scale; use ``split_mod``
    at 100 TB.
    """
    w = Window.orderBy(order_by)
    n = df.count()
    cut = int(n * train_frac)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    train = ranked.filter(F.col("__rn") <= cut).drop("__rn")
    test = ranked.filter(F.col("__rn") > cut).drop("__rn")
    return train, test


def sample_rows(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Row sampling (reference: df.sample(frac, random_state))."""
    return df.sample(fraction=fraction, seed=seed)
