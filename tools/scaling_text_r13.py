"""Round-13 decade receipts for the text-family additions:
feature_hash_embed (hashing-trick vectorization), token_label_mi
(vocab x label grid), readability_scores (pure map), and
source_mix_report — sf1 vs sf10 on organic document replicas (doc_id
shift + the `t -> r{i}t` token rewrite from scaling_study's organic
build, so the VOCABULARY grows with the corpus — the honest axis for
the vocab-bounded claims: MI's grid output must grow linearly with
the vocab, never quadratically).

Usage: python tools/scaling_text_r13.py   (prints markdown rows)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import SHIFT, timed  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/ps_scale_text_r13"


def build(spark, replicas: int, dst: str) -> None:
    params = f"replicas={replicas};shift={SHIFT};text-r13-v1"
    marker = f"{dst}/_BUILD_COMPLETE"
    if os.path.exists(marker) and open(marker).read().strip() == params:
        return
    os.makedirs(dst, exist_ok=True)
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    out = None
    for i in range(replicas):
        part = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
        if i > 0:
            part = part.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"r{i}$1")
            )
        out = part if out is None else out.unionByName(part)
    out.repartition(max(4, replicas // 12)).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    with open(marker, "w") as f:
        f.write(params + "\n")


def main() -> None:
    spark = get_spark("scaling_text_r13")
    build(spark, 10, f"{ROOT}/sf1")
    build(spark, 100, f"{ROOT}/sf10")

    from petastorm_spark.operators.sampling_extra import source_mix_report
    from petastorm_spark.operators.text import (
        feature_hash_embed,
        fk_grade_level,
        flesch_reading_ease,
        token_label_mi,
    )

    def docs(sf):
        return spark.read.parquet(f"{ROOT}/{sf}/documents.parquet")

    # force the per-row work with a sum over a COMPUTED column —
    # count() lets Catalyst prune the map entirely (measured: the
    # readability regexps priced at 0 under count)
    cases = (
        ("feature_hash_embed (dim=64)",
         lambda d: feature_hash_embed(d, "text", "doc_id", dim=64)
         .agg(F.sum(F.element_at("embedding", 1))).collect()
         and feature_hash_embed(d, "text", "doc_id", dim=64).count()),
        ("token_label_mi (label=lang, min_df=5)",
         lambda d: token_label_mi(d, "text", "lang", min_df=5)
         .agg(F.sum("mi_term"), F.count(F.lit(1))).collect()[0][1]),
        ("readability (flesch+fk)",
         lambda d: d.select(
             flesch_reading_ease("text").alias("f"),
             fk_grade_level("text").alias("g"),
         ).agg(F.sum("f"), F.sum("g"), F.count(F.lit(1))).collect()[0][2]),
        ("source_mix_report",
         lambda d: source_mix_report(d, "text", "source")
         .agg(F.sum("ent_term"), F.count(F.lit(1))).collect()[0][1]),
    )
    for name, fn in cases:
        w1, n1 = timed(spark, lambda: fn(docs("sf1")))
        w10, n10 = timed(spark, lambda: fn(docs("sf10")))
        print(f"| {name} | {w1:.2f}s | {w10:.2f}s | {w10 / w1:.1f}x | "
              f"{n1:,} -> {n10:,} |", flush=True)


if __name__ == "__main__":
    main()
