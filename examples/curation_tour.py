"""Tour of the corpus-curation surface on the sf0.001 testdata:
curation pipeline (with the model-based quality gate), token-budget
mixture planning, BPE tokenizer training, and semantic dedup over
embeddings. Everything stays a Catalyst plan until the prints.

    PYTHONPATH=. python examples/curation_tour.py
"""

from pyspark.sql import functions as F

from petastorm_spark.operators.bpe import bpe_learn
from petastorm_spark.operators.pipeline import curate_corpus, curation_report
from petastorm_spark.operators.sampling_extra import token_budget_mix
from petastorm_spark.operators.similarity import semantic_dedup
from petastorm_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("curation_tour")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # 1. the standard curation chain + per-stage attrition
    stages = curate_corpus(
        docs, "text", "doc_id",
        quality_floor=0.8,
        strata_col="source", max_per_stratum=15,
        classifier_floor=0.4,  # model-based gate (derived weights here)
    )
    print("attrition:")
    for row in curation_report(stages).collect():
        print(f"  {row.stage:<12} {row.n_rows}")

    # 2. plan a 100k-token mixture at temperature 0.7
    print("mixture plan:")
    for r in token_budget_mix(docs, "text", "source", 100_000, 0.7).orderBy(
        F.desc("n_tokens")
    ).limit(5).collect():
        print(f"  {r.source:<8} {r.n_tokens:>7} tokens  keep={r.keep_frac}")

    # 3. train 8 BPE merges on the curated output
    merges, vocab = bpe_learn(stages["output"], "text", num_merges=8)
    vocab.unpersist()
    print("bpe merges:", [(a, b) for a, b, _ in merges])

    # 4. semantic dedup over the embedding table (+ planted copies)
    both = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    )
    removed = semantic_dedup(both, "vec_id", "embedding", n_cells=8)
    print("semantic dedup removes:", removed.count(), "vectors")

    # 5. cluster-balanced diversity quota: engine-exact k-means, then
    # an equal md5-deterministic draw per semantic cluster
    from petastorm_spark.operators.similarity import kmeans_lloyd

    report = kmeans_lloyd(emb, k=4, dims=8, rounds=2)
    print("k-means cells:")
    for r in report.orderBy("cell").collect():
        print(f"  cell {r.cell}: {r.n_members} members, "
              f"inertia {r.inertia:.3f}")

    # 6. readability as a quality signal (punctuation-free corpus ->
    # the sentence floor; the words/syllables still separate docs)
    from petastorm_spark.operators.text import flesch_reading_ease

    fre = docs.select(F.round(flesch_reading_ease("text"), 1).alias("f"))
    lo, hi = fre.agg(F.min("f"), F.max("f")).first()
    print(f"flesch range across corpus: {lo} .. {hi}")

    # 7. ship per-source aggregates under eps-DP (seeded audit mode)
    from petastorm_spark.operators.privacy import dp_group_release

    print("dp release (eps=1, counts):")
    for r in dp_group_release(docs, "source", epsilon=1.0).orderBy(
        "source"
    ).collect():
        print(f"  {r.source:<8} noisy_count={r.noisy_count}")


if __name__ == "__main__":
    main()
