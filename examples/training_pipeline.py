"""End-to-end LLM-training-data pipeline on the testdata documents
table: dedup -> quality filter -> deterministic split -> converter ->
batched loader. Every stage is a Catalyst plan until the final feed.

    PYTHONPATH=. python examples/training_pipeline.py
"""

from pyspark.sql import functions as F

from petastorm_spark import get_spark, in_pseudorandom_split, make_spark_converter
from petastorm_spark.bridges.tf import batch_generator
from petastorm_spark.operators import text as T
from petastorm_spark.operators.dedup import exact_dedup


def main():
    spark = get_spark("training_pipeline", cpus=4)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    # 1. exact dedup: keep one row per digest
    keep = exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = docs.join(keep, "doc_id")

    # 2. quality filter + features (pure map, JVM-side)
    scored = deduped.select(
        "doc_id",
        "text",
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    ).where(F.col("quality") > 0.6)

    # 3. deterministic 90/10 split keyed on doc_id (stable as data grows)
    train_pred = in_pseudorandom_split([0.9, 0.1], 0, "doc_id")
    train = scored.where(train_pred.to_column()).drop("text")

    # 4. materialize once, feed batches
    conv = make_spark_converter(train, dtype=None)
    try:
        print(f"train rows: {len(conv)}")
        with conv.make_batch_reader() as reader:
            for batch in batch_generator(reader, batch_size=64):
                print("batch:", len(batch["doc_id"]), "mean quality:",
                      float(batch["quality"].mean()))
                break
    finally:
        conv.delete()


if __name__ == "__main__":
    main()
