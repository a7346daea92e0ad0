"""Round-15: the hierarchical two-level probe at its actual design
point (the r14 verdict's #2). The r14 receipts exercised
probe_cells_hierarchical at C=64 (oracle) and a trained toy quantizer
(pytest); its reason to exist is C approaching/past the
_MAX_LOCAL_CELLS=16384 flat-matmul ceiling. This measures, on the
sf10 ORGANIC embeddings replica (200k vectors, dim 64, the
scaling_r13 build) with C=4096 (n_l1 = sqrt(C) = 64):

- (a) ASSIGNMENT WALL: the flat probe's full batch x C matmul vs the
  hierarchical probe at l1_probe 2 / 4 / 8 (same n_probe=2, same
  mapInPandas plumbing — the delta is pure score work);
- (b) QUALITY vs l1_probe: home-cell agreement with the exact flat
  assignment, and probe-set recall (fraction of the flat probe's
  n_probe cells the hierarchical probe also selects) — the tuning
  curve a 100 TB user reads to pick l1_probe;
- in THREE regimes: UNTRAINED quantizer (lowest-id corpus vectors —
  the negative control: random centroids give the L1 level no
  geometry to prune on), TRAINED (Spark ML k-means on the same
  replica corpus — which is DELIBERATELY decorrelated: the scaling
  replicas apply orthogonal signed permutations per replica, so even
  a trained quantizer finds no clusters; the honest unclusterable
  worst case), and CLUSTERED (200k points planted around 4096
  centers, quantizer = the true centers — the regime real embedding
  corpora live in, where text/image embeddings occupy low-dimensional
  manifolds; the pytest fixture's shape at the receipt's scale).

C=4096 is chosen INSIDE the flat ceiling on purpose: the flat probe
must still run to provide exact ground truth for (b). The score-work
model is C vs sqrt(C) * (1 + l1_probe), so the measured wall ratio at
C=4096 transfers to any C past the ceiling where the flat probe
cannot run at all.

Usage: python tools/scaling_r15_hier.py  (markdown for SCALING_OUT.md)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.operators.similarity import (  # noqa: E402
    _probe_cells_numpy,
    probe_cells_hierarchical,
    train_kmeans_centroids,
)
from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import ROOT, build, timed  # noqa: E402

C = 4096
N_PROBE = 2


def run_arm(spark, emb, crows, label: str) -> None:
    # keep_order=True on BOTH probes: _cells[0] is the rank-1 HOME
    # cell (sorted _cells would compare min-of-probes, understating
    # agreement whenever only the far-tied rank-2 cell differs)
    flat = _probe_cells_numpy(
        emb, crows, "vec_id", "embedding", N_PROBE, True
    )
    w_flat, _ = timed(spark, lambda: flat.count())
    print(f"| {label} flat probe (C={C} matmul) | {w_flat:.2f}s | exact | — |")

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
                f"| {label} hier l1_rounds={rounds} l1_probe={lp} | "
                f"{w:.2f}s ({w_flat / w:.1f}x faster) | home agree "
                f"{agg['home_agree']:.4f} | probe recall "
                f"{agg['probe_recall']:.4f} |"
            )
    fhome.unpersist()


def clustered_fixture(spark):
    """200k points planted around 4096 seeded centers (dim 64, noise
    sigma 0.05 x center scale) + the true centers as the quantizer —
    built once under /tmp/ps_scale_r15, read back as a DataFrame."""
    import numpy as np

    root = "/tmp/ps_scale_r15/clustered"
    marker = f"{root}/_BUILD_COMPLETE"
    params = f"C={C};n=200000;dim=64;r15-v1"
    if not (os.path.exists(marker) and open(marker).read().strip() == params):
        import pandas as pd

        rng = np.random.default_rng(15)
        centers = rng.normal(size=(C, 64)) * 10.0
        assign = rng.integers(0, C, size=200_000)
        pts = centers[assign] + rng.normal(size=(200_000, 64)) * 0.5
        os.makedirs(root, exist_ok=True)
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(200_000),
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
        spark.read.parquet(f"{root}/cent").collect(),
    )


def main() -> None:
    spark = get_spark(
        "scaling_r15_hier",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    arms = sys.argv[1:] or ["untrained", "trained", "clustered"]
    build(spark, 100, f"{ROOT}/sf10")
    emb = spark.read.parquet(f"{ROOT}/sf10/embeddings.parquet")
    n = emb.count()
    print(f"corpus N={n}, C={C}, n_l1=sqrt(C)=64, n_probe={N_PROBE}\n")

    if "untrained" in arms:
        untrained = (
            emb.orderBy("vec_id")
            .limit(C)
            .select(
                F.col("vec_id").alias("cell"),
                F.col("embedding").alias("cent_vec"),
            )
            .collect()
        )
        run_arm(spark, emb, untrained, "untrained")

    if "trained" in arms:
        import time

        t0 = time.perf_counter()
        cent = train_kmeans_centroids(emb, n_cells=C, seed=7, max_iter=3)
        trained = cent.collect()
        print(
            f"\nk-means train (k={C}, maxIter=3): "
            f"{time.perf_counter() - t0:.1f}s, {len(trained)} cells"
        )
        run_arm(spark, emb, trained, "trained")

    if "clustered" in arms:
        cemb, ccrows = clustered_fixture(spark)
        run_arm(spark, cemb, sorted(ccrows, key=lambda r: r["cell"]), "clustered")


if __name__ == "__main__":
    main()
