"""Key/candidate-volume study behind SCALING_OUT.md's organic ratios.

The round-9 verdict asked for the wall-ratio explanations to be DATA:
for the pair ops whose organic wall ratio exceeds the rows-out growth,
measure the quantity the plan's cost actually follows —

- ``dedup_substring_windows``: DISTINCT window hashes (the shuffle key
  cardinality; the synthetic build's identical copies collapse windows
  10:1 while the organic rewrite multiplies them);
- ``dedup_embedding_pairs``: candidate pairs = sum over (bucket, sub)
  groups of C(n, 2) — the exact number of cosine verifications the
  bucket self-join scores (fixed 8-plane index ⇒ quadratic in corpus
  size; production passes ``corpus_size_hint``);
- ``dedup_semantic`` / ``dedup_semantic_probe2``: scored pairs =
  sum over cells of C(n_cell, 2) from the SAME assignment the operator
  computes (adaptive cell count ⇒ near-linear by design).

Prints a markdown table (sf0.1 vs sf1-ORGANIC volumes + volume ratio)
to paste into SCALING_OUT.md's key-volume section. Run AFTER
tools/scaling_study.py has built /tmp/ps_scale_sf1_organic.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
ORGANIC = "/tmp/ps_scale_sf1_organic"


def _pairs_from_keys(keys, group_cols) -> int:
    """sum over groups of C(n, 2) — candidate pairs a same-key
    self-join scores — computed from group sizes, never by joining."""
    agg = keys.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    row = agg.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")
    ).collect()[0]
    return int(row["p"] or 0)


def measure(sf_dir: str) -> dict[str, int]:
    from petastorm_spark.operators.dedup import hash60, tokens
    from petastorm_spark.operators.similarity import (
        embedding_near_dup_pairs,
        semantic_dedup,
    )
    from petastorm_spark.queries_llm import _COPY_SHIFT, _adaptive_cells, _t, _t_wide

    spark = get_spark("key_volume")
    out: dict[str, int] = {}

    # distinct window hashes (dedup_substring_windows, k=4)
    d = _t_wide(spark, sf_dir, "documents")
    k = 4
    base = d.withColumn("_toks", tokens("text")).where(F.size("_toks") >= k)
    wins = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - k),
        lambda i: hash60(F.concat_ws(" ", F.slice("_toks", i + 1, k))),
    )
    occ = base.select(F.explode(wins).alias("_h"))
    out["substring_total_windows"] = occ.count()
    out["substring_distinct_windows"] = occ.distinct().count()

    # embedding corpora as the queries build them (corpus + shifted copy)
    emb = _t_wide(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    both = emb.unionByName(
        emb.select((F.col("vec_id") + _COPY_SHIFT).alias("vec_id"), "embedding")
    )
    n = 2 * _t(spark, sf_dir, "embeddings").count()
    out["corpus_vectors"] = n

    for tag, hint in (("fixed8", None), ("adaptive", n)):
        keys = embedding_near_dup_pairs(
            both, "vec_id", "embedding", dim=64, threshold=0.995,
            n_planes=8, seed=7, corpus_size_hint=hint, _keys_only=True,
        )
        out[f"embedding_candidate_pairs_{tag}"] = _pairs_from_keys(
            keys, ["bucket", "_sub"]
        )

    for name, n_probe, cells in (
        ("semantic", 1, 16),
        ("semantic_probe2", 2, _adaptive_cells(n, 64, 64)),
    ):
        keys = semantic_dedup(
            both, "vec_id", "embedding", n_cells=cells,
            threshold=0.95, n_probe=n_probe, _keys_only=True,
        )
        out[f"{name}_cells"] = cells
        out[f"{name}_scored_pairs"] = _pairs_from_keys(keys, ["cell"])

    # winnowing_matches (k=3, w=4, max_df=10, the query's params):
    # distinct SELECTED fingerprints are the pair stage's shuffle-key
    # cardinality; df-capped joined pair rows = sum over rare fps of
    # C(df, 2) — the exact fan-out the self-join materializes
    from petastorm_spark.operators.dedup import winnow_fingerprints

    docs = _t_wide(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.unionByName(
        docs.select((F.col("doc_id") + _COPY_SHIFT).alias("doc_id"), "text")
    )
    sel = winnow_fingerprints(docs, "text", "doc_id", 3, 4).select(
        "doc_id", "fp"
    ).distinct()
    out["winnowing_distinct_fps"] = sel.select("fp").distinct().count()
    dfc = sel.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).where(
        F.col("n") <= 10
    )
    row = dfc.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")).collect()[0]
    out["winnowing_pair_rows"] = int(row["p"] or 0)
    return out


def main() -> None:
    a = measure(SF01)
    b = measure(ORGANIC)
    rows = [
        ("dedup_substring_windows", "distinct window hashes",
         a["substring_distinct_windows"], b["substring_distinct_windows"]),
        ("dedup_embedding_pairs", "candidate pairs, FIXED 8 planes",
         a["embedding_candidate_pairs_fixed8"],
         b["embedding_candidate_pairs_fixed8"]),
        ("dedup_embedding_pairs", "candidate pairs, adaptive planes (the query)",
         a["embedding_candidate_pairs_adaptive"],
         b["embedding_candidate_pairs_adaptive"]),
        ("dedup_semantic", f"scored pairs ({a['semantic_cells']} -> "
         f"{b['semantic_cells']} cells)",
         a["semantic_scored_pairs"], b["semantic_scored_pairs"]),
        ("dedup_semantic_probe2", f"scored pairs ({a['semantic_probe2_cells']} -> "
         f"{b['semantic_probe2_cells']} cells, 2 probes)",
         a["semantic_probe2_scored_pairs"], b["semantic_probe2_scored_pairs"]),
        ("winnowing_matches", "distinct selected fingerprints",
         a["winnowing_distinct_fps"], b["winnowing_distinct_fps"]),
        ("winnowing_matches", "df-capped joined pair rows",
         a["winnowing_pair_rows"], b["winnowing_pair_rows"]),
    ]
    print("| query | cost key | sf0.1 | sf1-ORGANIC | key ratio |")
    print("|---|---|---|---|---|")
    for q, key, va, vb in rows:
        ratio = vb / va if va else float("inf")
        print(f"| {q} | {key} | {va:,} | {vb:,} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
