"""Similarity search over embedding columns.

Beyond-reference surface: brute-force cosine top-k (the exactness
baseline) and a random-hyperplane LSH-bucketed approximate variant (the
scale path).  Embeddings are integer-quantized (``round(x*scale)``) so
dot products and norms are exact integer sums — reduction-order
independent, engine-portable, and the same storage trick int8-quantized
ANN indexes use at scale.

Scale design: top-k uses ``orderBy(...).limit(k)`` which Spark executes
as a TakeOrderedAndProject — each partition keeps a local k-heap and
only k rows per partition reach the driver-side merge; no global sort,
no single-partition window.  The LSH variant prunes the candidate set
to one bucket before scoring (buckets are a cheap per-row signature, so
the index "build" is a projection, and bucket probing is a semi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import QuantizedCosineDeduplicator


class CosineTopK:
    """Exact brute-force cosine top-k against one query vector."""

    def __init__(self, k: int = 10, scale: int = 1000):
        self.k = k
        self.scale = scale

    def _prep(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        q = (f"transform({vec_col}, x -> "
             f"cast(round(cast(x as double) * {self.scale}) as bigint))")
        return (
            df.select(F.col(id_col).alias(id_col), F.expr(q).alias("__q"))
            .withColumn("__nrm",
                        F.expr("sqrt(aggregate(__q, 0L, (acc, x) -> acc + x*x))"))
        )

    def search(self, df: DataFrame, query_id, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
        """Top-k neighbors of the in-table vector ``query_id``.

        The 1-row query side is broadcast; the scan side streams through
        codegen computing one integer dot product per row.
        """
        prepped = self._prep(df, id_col, vec_col)
        qrow = (prepped.filter(F.col(id_col) == query_id)
                .select(F.col("__q").alias("__qq"), F.col("__nrm").alias("__qn")))
        dot = "aggregate(zip_with(__q, __qq, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"
        return (
            prepped.filter(F.col(id_col) != query_id)
            .crossJoin(F.broadcast(qrow))
            .withColumn("cosine",
                        F.round(F.expr(dot) / (F.col("__nrm") * F.col("__qn")), 6))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(self.k)
        )


class IVFIndex:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions vectors into ``n_lists`` cells; a query probes only the
    ``n_probe`` nearest cells and scores exact cosine inside them.

    The standard ANN scale path next to LSH: the assignment table is the
    "index" (at 100 TB it would be written partitioned by ``list_id`` so
    a probe is a partition-pruned scan of n_probe/n_lists of the data);
    centroids are tiny (n_lists × dim) and live on the driver like any
    fitted-model parameter.  Deterministic via a fixed KMeans seed.
    """

    def __init__(self, k: int = 10, n_lists: int = 8, n_probe: int = 2,
                 seed: int = 42):
        self.k = k
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.seed = seed
        self.centroids = None        # list[list[float]]
        self._assigned = None        # DataFrame(id, __list, __arr, __nrm)

    def fit(self, df: DataFrame, id_col: str = "vec_id",
            vec_col: str = "embedding"):
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        arr = df.select(
            F.col(id_col),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("__arr"),
        )
        feats = arr.withColumn("__v", array_to_vector("__arr"))
        model = KMeans(k=self.n_lists, seed=self.seed, maxIter=10,
                       featuresCol="__v", predictionCol="__list").fit(feats)
        self.centroids = [c.tolist() for c in model.clusterCenters()]
        self._assigned = (
            model.transform(feats).select(id_col, "__arr", "__list")
            .withColumn("__nrm", F.expr(
                "sqrt(aggregate(__arr, 0D, (acc, x) -> acc + x*x))"))
            .persist()
        )
        self._assigned.count()
        return self

    def _probe_lists(self, qvec: list[float]) -> list[int]:
        def d2(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))
        order = sorted(range(len(self.centroids)),
                       key=lambda i: d2(self.centroids[i], qvec))
        return order[:self.n_probe]

    def search(self, query_id, id_col: str = "vec_id") -> DataFrame:
        assert self._assigned is not None, "call fit first"
        qrow = (self._assigned.filter(F.col(id_col) == query_id)
                .select("__arr", "__nrm").head())
        lists = self._probe_lists(list(qrow["__arr"]))
        dot = "aggregate(zip_with(__arr, __qq, (x, y) -> x*y), 0D, (acc, v) -> acc + v)"
        qdf = self._assigned.sparkSession.createDataFrame(
            [(list(qrow["__arr"]), float(qrow["__nrm"]))], "__qq array<double>, __qn double")
        return (
            self._assigned.filter(F.col("__list").isin(lists)
                                  & (F.col(id_col) != query_id))
            .crossJoin(F.broadcast(qdf))
            .withColumn("cosine",
                        F.round(F.expr(dot) / (F.col("__nrm") * F.col("__qn")), 6))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(self.k)
        )


class HyperplaneLSHIndex:
    """Approximate top-k: random-hyperplane sign buckets, then exact
    cosine within the query's bucket only.

    Deterministic ±1 hyperplanes (md5-derived, see
    ``QuantizedCosineDeduplicator.hyperplane``) make the approximation
    itself replayable by a SQL oracle.  At scale the bucketed table
    would be written partitioned by ``bucket`` so a probe is a
    partition-pruned scan of ~1/2^n_planes of the data.
    """

    def __init__(self, k: int = 5, n_planes: int = 8, scale: int = 1000,
                 dim: int = 64):
        self.k = k
        self.q = QuantizedCosineDeduplicator(scale=scale, n_planes=n_planes,
                                             dim=dim)

    def bucketize(self, df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
        """(id, quantized vec, norm, bucket) — the 'index'."""
        out = self.q._quant(df, id_col, vec_col)
        return (
            out.withColumn("__bucket", self.q.bucket_col())
            .withColumnRenamed("__id", id_col)
        )

    def search(self, df: DataFrame, query_id, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
        idx = self.bucketize(df, id_col, vec_col)
        qrow = (idx.filter(F.col(id_col) == query_id)
                .select(F.col("__q").alias("__qq"), F.col("__nrm").alias("__qn"),
                        F.col("__bucket").alias("__qb")))
        dot = "aggregate(zip_with(__q, __qq, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"
        return (
            idx.filter(F.col(id_col) != query_id)
            .crossJoin(F.broadcast(qrow))
            .filter(F.col("__bucket") == F.col("__qb"))
            .withColumn("cosine",
                        F.round(F.expr(dot) / (F.col("__nrm") * F.col("__qn")), 6))
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(self.k)
        )
