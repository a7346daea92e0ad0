"""Round-16: the hierarchical probe PAST the flat ceiling (the r15
verdict's #4). The r15 receipt ran C=4096/N=200k — inside the
_MAX_LOCAL_CELLS=16384 flat-matmul ceiling, so the flat probe could
provide ground truth. The design point that justifies the operator is
C PAST the ceiling, where knn_graph's flat path REFUSES outright
(similarity.py:1050). This measures, on a planted-cluster fixture
(200k points around C=32768 seeded centers, dim 64 — the clustered
regime real embedding corpora live in):

- (a) the REFUSAL receipt: knn_graph_write(hierarchical=False) at
  C=32768 raises — the guard is the designed behavior (the in-memory
  knn_graph instead degrades to the broadcast-join ranking, which is
  exactly the slow path the hierarchical probe exists to replace);
- (b) assignment walls: the EXACT full-matmul probe — run deliberately
  through the internal `_probe_cells_numpy` kernel, the thing the
  guard forbids as a default path, to provide ground truth — vs the
  hierarchical probe at l1_probe 2/4/8, l1_rounds 0 and 4
  (n_l1 = ceil(sqrt(C)) = 182; score model C vs n_l1 * (1 + l1_probe)
  predicts 32768 vs 546..1638 scores/vector = 20-60x less work);
- (c) quality: home-cell agreement + probe-set recall vs exact, the
  curve a 100 TB user reads to pick l1_probe past the ceiling.

keep_order=True on BOTH probes (the r15 receipt gotcha: sorted
_cells[0] is the min cell id, not the rank-1 home).

Usage: python tools/scaling_r16_hier.py  (markdown for SCALING_OUT.md)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.operators.similarity import (  # noqa: E402
    _probe_cells_numpy,
    knn_graph_write,
    probe_cells_hierarchical,
)
from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import timed  # noqa: E402

C = 32768
N = 200_000
DIM = 64
N_PROBE = 2


def clustered_fixture(spark):
    """200k points planted around C=32768 seeded centers + the true
    centers as the quantizer — built once under /tmp/ps_scale_r16."""
    import numpy as np
    import pandas as pd

    root = "/tmp/ps_scale_r16/clustered"
    marker = f"{root}/_BUILD_COMPLETE"
    params = f"C={C};n={N};dim={DIM};r16-v1"
    if not (os.path.exists(marker) and open(marker).read().strip() == params):
        rng = np.random.default_rng(16)
        centers = rng.normal(size=(C, DIM)) * 10.0
        assign = rng.integers(0, C, size=N)
        pts = centers[assign] + rng.normal(size=(N, DIM)) * 0.5
        os.makedirs(root, exist_ok=True)
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(N),
                    "embedding": [list(map(float, v)) for v in pts],
                }
            )
        ).repartition(16).write.mode("overwrite").parquet(f"{root}/emb")
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "cell": np.arange(C),
                    "cent_vec": [list(map(float, c)) for c in centers],
                }
            )
        ).write.mode("overwrite").parquet(f"{root}/cent")
        with open(marker, "w") as f:
            f.write(params)
    return (
        spark.read.parquet(f"{root}/emb"),
        sorted(
            spark.read.parquet(f"{root}/cent").collect(),
            key=lambda r: r["cell"],
        ),
    )


def main() -> None:
    spark = get_spark(
        "scaling_r16_hier",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    emb, crows = clustered_fixture(spark)
    n = emb.count()
    import math

    n_l1 = max(4, math.isqrt(len(crows) - 1) + 1)
    print(f"corpus N={n}, C={C} (> _MAX_LOCAL_CELLS=16384), "
          f"n_l1=ceil(sqrt(C))={n_l1}, n_probe={N_PROBE}\n")

    # (a) the refusal receipt
    try:
        knn_graph_write(
            "/tmp/ps_scale_r16/refusal_probe", emb, k=3,
            centroids=spark.createDataFrame(crows), n_probe=N_PROBE,
            hierarchical=False,
        )
        print("| flat knn_graph_write at C=32768 | DID NOT REFUSE (BUG) |")
    except ValueError as e:
        print(f"| flat knn_graph_write at C=32768 | REFUSES by design: "
              f"{str(e)[:90]}… | — | — |")

    # (b)+(c): exact ground truth via the internal kernel
    flat = _probe_cells_numpy(emb, crows, "vec_id", "embedding",
                              N_PROBE, True)
    w_flat, _ = timed(spark, lambda: flat.count())
    print(f"| exact full matmul (ground truth, C={C}) | {w_flat:.2f}s "
          f"| exact | — |")

    fhome = flat.select(
        "vec_id",
        F.element_at("_cells", 1).alias("f_home"),
        F.col("_cells").alias("f_cells"),
    ).persist()
    fhome.count()
    for rounds in (0, 4):
        for lp in (2, 4, 8):
            hier = probe_cells_hierarchical(
                emb, crows, "vec_id", "embedding", N_PROBE,
                l1_probe=lp, keep_order=True, l1_rounds=rounds,
            )
            w, _ = timed(spark, lambda h=hier: h.count())
            agg = (
                hier.select(
                    "vec_id",
                    F.element_at("_cells", 1).alias("h_home"),
                    F.col("_cells").alias("h_cells"),
                )
                .join(fhome, "vec_id")
                .agg(
                    F.avg(
                        (F.col("h_home") == F.col("f_home")).cast("double")
                    ).alias("home_agree"),
                    F.avg(
                        F.size(F.array_intersect("h_cells", "f_cells"))
                        / F.size("f_cells")
                    ).alias("probe_recall"),
                )
                .first()
            )
            print(
                f"| hier l1_rounds={rounds} l1_probe={lp} | "
                f"{w:.2f}s ({w_flat / w:.1f}x under exact) | home agree "
                f"{agg['home_agree']:.4f} | probe recall "
                f"{agg['probe_recall']:.4f} |"
            )
    fhome.unpersist()


if __name__ == "__main__":
    main()
