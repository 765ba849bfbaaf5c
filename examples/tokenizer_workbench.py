"""Subword-tokenizer workbench over the documents table:

    ExactSubstr span-trim → unigram-LM vocab fit → corpus token counts
    → BM25 retrieval probe → Count-Min heavy-hitter screen on events

The round-6 operator tier end-to-end: repeated-span removal shrinks the
corpus BEFORE the tokenizer sees it (the Lee et al. 2022 recipe), the
unigram trainer fits on the distinct-word table, BM25 answers "which
documents match this query best" lexically, and the CMS screens the hot
event users that a curation run would cap.  Run with an optional sf dir.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark.dedup import SubstringDeduplicator  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.sketches import CountMinSketch  # noqa: E402
from dataframe_pipeline_spark.text import BM25Retriever  # noqa: E402
from dataframe_pipeline_spark.unigram import (UnigramTokenizer,  # noqa: E402
                                              UnigramTrainer)

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("tokenizer_workbench")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # 1. ExactSubstr trim: cut any 5-token span that repeats verbatim
    #    anywhere in the corpus (no pairs — digest groupBy + islands)
    trimmed = SubstringDeduplicator(k=5).transform(docs)
    removed = trimmed.agg(F.sum("n_removed").alias("t")).head()["t"]
    print(f"ExactSubstr: removed {removed} duplicated tokens")

    # 2. unigram-LM fit on the TRIMMED corpus (distinct-word table),
    #    then corpus-wide token counts
    tr = UnigramTrainer(vocab_size=80, seed_size=300, max_piece_len=4,
                        n_iters=2).fit(trimmed, "text")
    tok = UnigramTokenizer(tr.scores_, 4)
    top = (tok.token_counts(trimmed, "text")
           .orderBy(F.desc("n"), F.asc("token")).limit(8).collect())
    print("unigram vocab:", len(tr.counts_), "pieces; top tokens:",
          [(r.token, r.n) for r in top])

    # 3. BM25 lexical probe — one codegen scan + a 1-row stats broadcast
    hits = BM25Retriever(["spark", "join", "window"]).topk(docs, 5)
    print("BM25 top-5:", [(r.doc_id, r.score) for r in hits.collect()])

    # 4. CMS heavy-hitter screen on events.user_id — bounded sketch,
    #    estimate >= truth always
    ev = spark.read.parquet(f"{SF}/events.parquet")
    cms = CountMinSketch(depth=4, width=512)
    est = cms.estimate(cms.build(ev, "user_id"), [1, 2, 3])
    print("CMS estimates:", sorted((r.key, r.est) for r in est.collect()))

    if os.environ.get("DFP_EXPLAIN"):
        trimmed.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
