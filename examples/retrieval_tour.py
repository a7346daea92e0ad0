"""Tour of the retrieval/similarity surface on the sf0.001 testdata:
the full ANN ladder (exact -> LSH -> IVF -> PQ -> IVF-PQ), persistent
indexes with partition-pruned probes, hybrid BM25+ANN fusion, margin
bitext mining, and incremental semantic dedup against a growing index.

    PYTHONPATH=. python examples/retrieval_tour.py
"""

from pyspark.sql import functions as F

from petastorm_spark.operators.sampling_extra import rrf_fuse
from petastorm_spark.operators.similarity import (
    bitext_margin_mine,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_ivfpq,
    cosine_topk_lsh,
    cosine_topk_pq,
    incremental_semantic_dedup,
    ivf_build,
)
from petastorm_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


def main() -> None:
    spark = get_spark("retrieval_tour")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.where(F.col("vec_id") < 5)

    # 1. the ANN ladder — same output shape, different cost/recall
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, q, k=5).collect()}
    for name, fn in [
        ("lsh", lambda: cosine_topk_lsh(emb, q, dim=DIM, k=5)),
        ("ivf", lambda: cosine_topk_ivf(emb, q, k=5, n_cells=8, n_probe=3)),
        ("pq", lambda: cosine_topk_pq(emb, q, k=5, dim=DIM, m=8, k_codes=16)),
        ("ivfpq", lambda: cosine_topk_ivfpq(
            emb, q, k=5, dim=DIM, n_cells=8, n_probe=3, m=8, k_codes=16)),
    ]:
        got = {(r.query_id, r.neighbor_id) for r in fn().collect()}
        print(f"{name}: recall@5 = {len(exact & got) / len(exact):.2f}")

    # 2. hybrid retrieval: fuse two ranked lists by reciprocal rank
    a = cosine_topk(emb, q.limit(1), k=10).select(
        F.col("neighbor_id").alias("vec_id"), "rank"
    )
    b = cosine_topk_ivf(emb, q.limit(1), k=10, n_cells=8, n_probe=2).select(
        F.col("neighbor_id").alias("vec_id"), "rank"
    )
    print("rrf fused top-3:")
    rrf_fuse([a, b], "vec_id", k=3).show()

    # 3. margin bitext mining (even ids = source side, odd = target)
    src = emb.where(F.col("vec_id") % 2 == 0)
    tgt = emb.where(F.col("vec_id") % 2 == 1)
    mined = bitext_margin_mine(src, tgt, src.where(F.col("vec_id") < 10), k=4)
    print("mined pairs:", mined.count())

    # 4. incremental semantic dedup: a re-ingested batch against the
    # corpus index surfaces its originals at cos 1.0
    cent, assigned = ivf_build(emb, n_cells=8)
    batch = q.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    matches = incremental_semantic_dedup(batch, cent, assigned, threshold=0.95)
    print("incremental matches:", matches.count())

    # 5. the persisted all-pairs kNN graph (r13): build on most of the
    # corpus, APPEND a batch (only the affected edge partitions are
    # rewritten), read back the full graph
    import tempfile

    from petastorm_spark.operators.similarity import (
        knn_graph_append,
        knn_graph_read,
        knn_graph_write,
    )

    url = tempfile.mkdtemp(prefix="ps_kg_tour") + "/graph"
    knn_graph_write(
        url, emb.where(F.col("vec_id") % 17 != 0), k=3, n_cells=16, n_probe=2
    )
    changed = knn_graph_append(
        spark, url, emb.where(F.col("vec_id") % 17 == 0)
    )
    print("append changed edges:", changed.count())
    _, edges = knn_graph_read(spark, url)
    print("graph edges:", edges.count())

    # 6. retrieval STRAIGHT FROM TEXT (r13): the signed hashing trick
    # vectorizes the documents table with no model and no vocabulary,
    # then the same cosine machinery retrieves near-duplicate text
    from petastorm_spark.operators.similarity import normalize_embeddings
    from petastorm_spark.operators.text import feature_hash_embed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hv = normalize_embeddings(
        feature_hash_embed(docs, "text", "doc_id", dim=64),
        id_col="doc_id",
    )
    hits = cosine_topk(
        hv, hv.where(F.col("doc_id") < 3), k=3, id_col="doc_id"
    )
    print("hashed-text retrieval:")
    for r in hits.orderBy("query_id", "rank").collect():
        print(f"  q{r.query_id} -> doc {r.neighbor_id} cos {r.cos_sim}")

    spark.stop()


if __name__ == "__main__":
    main()
