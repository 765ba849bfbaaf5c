"""End-to-end LLM training-data curation over the documents table:

    score → filter → exact-dedup → near-dedup (MinHash clusters) →
    decontaminate vs a benchmark set → domain-mix sample → token budget

Every stage is one of the engine's oracle-checked operators; the whole
chain is lazy Catalyst plans except the two driver-bounded steps
(cluster convergence loop, final counts).  Run with an optional sf dir.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark import dedup as dd  # noqa: E402
from dataframe_pipeline_spark import text as tx  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.sources import weighted_sample  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("llm_data_pipeline")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()

    # 1. score: quality + repetition + language — pure codegen columns
    scored = tx.RepetitionScorer().transform(
        tx.LanguageIdentifier().transform(
            tx.QualityScorer().transform(docs)))

    # 2. filter: drop low-quality / boilerplate / non-English
    kept = scored.filter(
        (F.col("quality_score") >= 0.3)
        & (F.col("dup_bigram_ratio") <= 0.5)
        & (F.col("pred_lang") == "en"))
    n1 = kept.count()

    # 3. exact dedup (content digest), then MinHash near-dup clusters:
    #    keep one survivor (min doc_id) per transitive cluster
    exact = dd.ExactDeduplicator().transform(kept)
    pairs = dd.MinHashLSHDeduplicator(k=16, bands=2, threshold=0.9).pairs(exact)
    deduped = dd.keep_canonical(exact, pairs)
    n2 = deduped.count()

    # 4. decontaminate: drop docs sharing any 3-gram with the
    #    'benchmark' set (here: every 50th doc plays the eval set) —
    #    AND docs whose EMBEDDING near-dups a benchmark item (r7:
    #    paraphrased leakage passes the n-gram screen, not the cosine
    #    screen; the corpus side never shuffles before the screen)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    contaminated = tx.ContaminationChecker(n=3).flag(
        deduped.filter(F.col("doc_id") % 50 != 0), bench) \
        .select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sem = dd.SemanticContaminationChecker(threshold=0.35, n_clusters=8) \
        .fit(emb.filter(F.col("vec_id") % 50 == 0))
    sem_flagged = (sem.flag(emb.filter(F.col("vec_id") % 50 != 0))
                   .select(F.col("vec_id").alias("doc_id")))
    clean = clean.join(sem_flagged, "doc_id", "left_anti")
    n3 = clean.count()

    # 5. domain mix: per-language keep rates (content-addressed, so the
    #    sample is stable under repartitioning and reruns)
    mixed = weighted_sample(clean, "pred_lang", {"en": 0.9}, key="doc_id",
                            default_rate=0.5)

    # 6. token budget of the final corpus
    budget = (tx.TokenCounter().transform(mixed)
              .agg(F.count(F.lit(1)).alias("docs"),
                   F.sum("ws_tokens").alias("ws_tokens"),
                   F.sum("subword_est").alias("subword_est")).head())

    # 7. chunk into overlapping context windows and pack into
    #    fixed-budget training sequences (shard-parallel)
    chunks = tx.DocumentChunker(max_tokens=48, overlap=8).transform(mixed)
    packer = tx.SequencePacker(budget=256, n_shards=8)
    fill = (packer.pack_stats(chunks)
            .agg(F.count(F.lit(1)).alias("packs"),
                 F.round(F.avg("fill_ratio"), 3).alias("avg_fill")).head())

    print(f"[llm_data_pipeline] {n0} docs -> quality/lang {n1} "
          f"-> dedup {n2} -> decontaminated {n3} "
          f"-> mixed {budget['docs']} docs, "
          f"{budget['ws_tokens']} ws tokens "
          f"(~{budget['subword_est']} subwords) "
          f"-> {fill['packs']} packed windows (avg fill {fill['avg_fill']})")
    spark.stop()


if __name__ == "__main__":
    main()
