"""Query-side scaling receipt for the round-11 distributed PQ/IVF-PQ
search path: the round-10 verdict's one growth item was the driver-side
ADC-table loop ("fine at thousands of queries, a driver bottleneck at
millions"). The tables are now built in a mapInPandas over the queries
DataFrame, so the query side scales like any other DataFrame — this
tool measures pq_query / ivfpq_query wall at 50 vs 5,000 queries
(100x) against the sf1-ORGANIC embeddings corpus and prints a markdown
table for SCALING_OUT.md.

Run AFTER tools/scaling_study.py has built /tmp/ps_scale_sf1_organic.
Timings are min-of-2 (the SCALING_OUT convention).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.session import get_spark  # noqa: E402

ORGANIC = "/tmp/ps_scale_sf1_organic"


def main() -> None:
    from petastorm_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_query,
        pq_codebooks,
        pq_encode,
        pq_query,
    )

    spark = get_spark("query_scaling")
    corpus = spark.read.parquet(f"{ORGANIC}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = corpus.count()

    # build both indexes ONCE (index cost is not what this measures)
    cb = pq_codebooks(corpus, dim=64, m=8, k_codes=16)
    coded = pq_encode(corpus, cb).localCheckpoint(eager=True)
    cent, cb2, coded2 = ivfpq_build(corpus, dim=64, n_cells=16, m=8, k_codes=16)
    coded2 = coded2.localCheckpoint(eager=True)

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return best

    rows = []
    for n_q in (50, 5000):
        q = corpus.orderBy("vec_id").limit(n_q).localCheckpoint(eager=True)
        # 5,000 queries x 19k corpus stays a broadcast-size query table;
        # the point is the ADC construction no longer serializes on the
        # driver — both regimes run the same distributed plan
        t_pq = timed(lambda: pq_query(cb, coded, corpus, q, k=5).count())
        t_ivfpq = timed(
            lambda: ivfpq_query(cent, cb2, coded2, corpus, q, k=5, n_probe=2).count()
        )
        rows.append((n_q, t_pq, t_ivfpq))

    print(f"corpus: {n:,} vectors (sf1-ORGANIC embeddings)")
    print("| queries | pq_query | ivfpq_query |")
    print("|---|---|---|")
    for n_q, t_pq, t_iv in rows:
        print(f"| {n_q:,} | {t_pq:.2f}s | {t_iv:.2f}s |")
    (q0, p0, i0), (q1, p1, i1) = rows
    print(f"100x queries -> pq {p1 / p0:.1f}x wall, ivfpq {i1 / i0:.1f}x wall")


if __name__ == "__main__":
    main()
