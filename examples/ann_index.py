"""ANN index lifecycle: fit → persist (partitioned) → reload → serve.

The deploy shape production ANN systems use (FAISS-style): the coarse
quantizer is trained once, the assignment table is written partitioned
by cell so it IS the index on disk, and a serving process reloads it
and probes with external query vectors — each probe a partition-pruned
scan of n_probe/n_lists of the data plus one broadcast of the 1-row
query.  Run with an optional sf dir argument.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.similarity import (IVFIndex,  # noqa: E402
                                                 PQIndex)

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("ann_index")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # 1. fit: driver-side deterministic k-means on a bounded sample,
    #    distributed map-only cell assignment
    idx = IVFIndex(k=5, n_lists=8, n_probe=2).fit(emb)

    with tempfile.TemporaryDirectory() as tmp:
        # 2. persist: cells/ partitioned by __list + pickled parameters
        path = f"{tmp}/ivf"
        idx.write(path)

        # 3. serve: reload (lazy scan of the partitioned layout) and
        #    probe with an *external* vector — no full-table lookup
        serving = IVFIndex.read(spark, path)
        qvec = list(emb.filter("vec_id = 0").head()["embedding"])
        hits = serving.search_vec(qvec)
        plan = hits._jdf.queryExecution().executedPlan().toString()
        pruned = next((l.strip() for l in plan.splitlines()
                       if "PartitionFilters: [__list" in l), "")
        print(f"[ann_index] probe partition filter: "
              f"...{pruned[pruned.find('PartitionFilters'):][:60]}...")
        hits.show()

        # 4. the COMPRESSED deploy shape (r7): PQ codes are 8 small
        #    ints per vector (~3 TB for 100 TB of raw embeddings); the
        #    persisted index holds ONLY codebooks + codes — search
        #    after reload never touches the raw vectors
        pq = PQIndex(k=5, m=8, k_sub=16).fit(emb)
        pq_path = f"{tmp}/pq"
        pq.write(pq_path)
        compressed = PQIndex.read(spark, pq_path)
        print("[ann_index] PQ ADC top-5 from the reloaded codes table:")
        compressed.search_vec(qvec, id_col="vec_id", exclude_id=0).show()
    spark.stop()


if __name__ == "__main__":
    main()
