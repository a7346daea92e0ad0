"""Round-14 decade receipt: the IVF AUTO-sizing default (#4 of the
r13 verdict) measured on the organic sf1 -> sf10 replicas.

The flip under test: ivf_build / cosine_topk_ivf / ivfpq_build /
semantic_dedup now default n_cells=None -> auto_n_cells = ceil(sqrt N)
(lowest-id deterministic quantizer). The claim is the sizing LAW, so
the receipt measures candidate-join volume under the auto quantizer at
two scales a decade apart:

- all-queries volume (queries = corpus, the kNN-graph/semantic-dedup
  shape): sum over cells of members x probers. sqrt(N) cells predict
  ~N^1.5 -> 10 * sqrt(10) ~ 31.6x per decade (a FIXED cell count
  would be ~N^2 -> 100x).
- fixed-query volume (1000 pinned base-replica queries, the
  ann_cosine_ivf shape): predicts ~sqrt(N) -> ~3.16x per decade
  (fixed cells would be ~N -> 10x).
- the ann_cosine_ivf-shaped query wall (10 queries, k=5, n_probe=3,
  AUTO cells) at both scales, min-of-2 with the bench GC discipline.

Reuses the r13 organic replica builder (vec_id shift + signed
coordinate permutation per replica) at /tmp/ps_scale_r13.

Usage: python tools/scaling_r14.py   (prints markdown rows for
SCALING_OUT.md)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import ROOT, build, timed  # noqa: E402


def ivf_auto_receipt(spark, sf_dir: str) -> dict:
    from petastorm_spark.operators.similarity import (
        _probe_cells_numpy,
        auto_n_cells,
        cosine_topk_ivf,
        ivf_build,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    cent, assigned = ivf_build(emb, "vec_id", "embedding")  # AUTO path
    crows = cent.select("cell", "cent_vec").collect()
    members = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("m"))

    def probe_volume(queries) -> int:
        probed = _probe_cells_numpy(
            queries, crows, "vec_id", "embedding", 3
        )
        probers = (
            probed.select(F.explode("_cells").alias("cell"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("p"))
        )
        return int(
            members.join(probers, "cell")
            .agg(F.sum(F.col("m") * F.col("p")).alias("v"))
            .collect()[0]["v"]
        )

    vol_all = probe_volume(emb)
    # base-replica ids < 1000 exist identically at every scale
    vol_fixed = probe_volume(emb.where(F.col("vec_id") < 1000))
    wall, rows = timed(
        spark,
        lambda: cosine_topk_ivf(
            emb, emb.where(F.col("vec_id") < 10), k=5, n_probe=3
        ).count(),
    )
    return {
        "N": n,
        "auto_n_cells": auto_n_cells(n),
        "n_cells": len(crows),
        "vol_all_queries": vol_all,
        "vol_fixed_1000q": vol_fixed,
        "ann_wall": wall,
        "ann_rows": rows,
    }


def main() -> None:
    spark = get_spark("scaling_r14")
    build(spark, 10, f"{ROOT}/sf1")
    build(spark, 100, f"{ROOT}/sf10")
    a = ivf_auto_receipt(spark, f"{ROOT}/sf1")
    b = ivf_auto_receipt(spark, f"{ROOT}/sf10")
    print(a)
    print(b)
    print(
        f"| ivf auto cells | {a['n_cells']} (N={a['N']:,}) | "
        f"{b['n_cells']} (N={b['N']:,}) | sqrt-law |"
    )
    print(
        f"| ivf auto candidate volume, queries=corpus | "
        f"{a['vol_all_queries']:,} | {b['vol_all_queries']:,} | "
        f"{b['vol_all_queries'] / a['vol_all_queries']:.1f}x "
        f"(N^1.5 predicts ~31.6x; fixed cells ~100x) |"
    )
    print(
        f"| ivf auto candidate volume, 1000 fixed queries | "
        f"{a['vol_fixed_1000q']:,} | {b['vol_fixed_1000q']:,} | "
        f"{b['vol_fixed_1000q'] / a['vol_fixed_1000q']:.2f}x "
        f"(sqrt(N) predicts ~3.16x; fixed cells ~10x) |"
    )
    print(
        f"| ann_cosine_ivf-shaped wall (10 q, auto cells) | "
        f"{a['ann_wall']:.2f}s | {b['ann_wall']:.2f}s | "
        f"{b['ann_wall'] / a['ann_wall']:.1f}x |"
    )


if __name__ == "__main__":
    main()
