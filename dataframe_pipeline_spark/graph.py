"""Iterative graph algorithms over edge DataFrames.

Companion to ``dedup.connected_components`` (min-label propagation):
this module holds the general fixed-iteration tier, starting with
PageRank.  The Spark-first shape for iterative algorithms:

* each iteration is a JOIN + grouped AGGREGATE on the edge list —
  both partial-aggregatable, shuffling only (node id, double) pairs;
* the lineage is cut with ``localCheckpoint`` every few iterations —
  without it the plan doubles per iteration and Catalyst analysis
  time, not the data, becomes the bottleneck (same discipline as
  connected_components);
* iteration count is FIXED (a hyperparameter), so the whole
  computation is replayable by an oracle that unrolls the same k
  steps — approximate-convergence loops ("iterate until delta < eps")
  belong above this primitive, not inside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

#: Cut plan lineage every this many PageRank iterations.
CHECKPOINT_EVERY = 5


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → one row per
    node: ``(id, pr)`` with ``pr`` scaled so a uniform graph scores 1.0
    (pr = N × probability — scale-free across corpus sizes and robust
    to float-compare at any N).

    Semantics: ``pr_{t+1}(v) = (1-d) + d * Σ_{(u,v)∈E} pr_t(u)/out(u)``
    (the N-scaled form of the standard update).  Dangling-node mass is
    dropped, not redistributed — documented choice, matching the
    common sparse-web formulation and keeping every iteration a pure
    edge join (redistribution needs an extra global aggregate per
    step).

    Plan per iteration: degree-annotated edges LEFT-joined to the
    previous iteration's SPARSE contribution table (only nodes with
    indegree > 0 carry state; a source with no entry reads as the base
    rank inline — ``pr_t(u) = (1-d) + d*coalesce(c_t(u), 0)`` is the
    identical double for every node, so no per-iteration join back to
    the full node set is needed) → groupBy dst (partial-aggregatable
    sum).  The full node set is joined exactly once, at the end, to
    emit zero-indegree nodes.  State per node is ONE double; duplicate
    edges are deduplicated up front so multi-edges don't double-count.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(F.col(src).alias("__s"),
                     F.col(dst).alias("__d")).distinct() \
        .persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (e.select(F.col("__s").alias("id"))
             .union(e.select("__d")).distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    nodes.count()
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    ew = e.join(deg, "__s")            # static across iterations
    base = F.lit(1.0 - damping)
    d = F.lit(damping)

    def rank(c_col):
        # pr_t(u) from the sparse contribution column: bit-identical to
        # the dense formulation for both present and absent nodes
        return base + d * F.coalesce(c_col, F.lit(0.0))

    contrib = None                     # iteration 0: every pr_0 = 1.0
    for i in range(iters):
        if contrib is None:
            joined = ew.withColumn("pr", F.lit(1.0))
        else:
            joined = (ew.join(contrib, ew["__s"] == contrib["id"], "left")
                      .withColumn("pr", rank(F.col("__c"))))
        contrib = (joined.groupBy(F.col("__d").alias("id"))
                   .agg(F.sum(F.col("pr") / F.col("__deg")).alias("__c")))
        if (i + 1) % CHECKPOINT_EVERY == 0 and i + 1 < iters:
            contrib = contrib.localCheckpoint()
    return (nodes.join(contrib, "id", "left")
            .select("id", rank(F.col("__c")).alias("pr")))
