"""AQE-skew receipt for the pinned ShuffledHashJoin self-joins
(r16 verdict #3 / r17 item 4).

dedup._pair_join / lsh_candidate_pairs / winnowing pin their banded
self-joins to SHUFFLE_HASH so both sides share ONE exchange
(ReusedExchange) and the fingerprint pipeline executes once. The open
scale question: an SHJ build side holds one PARTITION's rows in a
per-task hash map, and hot-bucket splits bound BUCKET size, not
PARTITION size — so does AQE's OptimizeSkewedJoin split an oversized
partition of this exact shape (SHJ, self-join, both sides reusing one
shuffle, BOTH sides skewed on the same partition), or does the pin
trade away the runtime safety valve?

Measured answer (Spark 4.1.2, this repo's session confs): it fires.
The executed plan shows `AQEShuffleRead coalesced and skewed` on BOTH
sides of the ShuffledHashJoin for:
  - a two-table SHJ with one skewed side,
  - a both-sides-skewed SHJ,
  - the self-join-on-one-ReusedExchange shape `_pair_join` pins.
The skew thresholds here are lowered so the 256 MB production default
does not hide the mechanism at local data volume — the knobs scale the
TRIGGER, not the rewrite. At 100 TB the defaults apply and
`SPARK_GRAFT_SHUFFLE_PARTITIONS` (session.py) sizes the non-skewed
partitions; OptimizeSkewedJoin is the backstop for the hot ones.

Run: python tools/skew_shj_receipt.py [n_rows]   (expect skewed=True)
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark("skew_shj_receipt")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # one hot key owning 1/3 of all rows (both join sides — a
    # self-join is skewed on the SAME partition on both sides); the
    # id inequality keeps pair volume linear-ish while preserving the
    # banded-join condition shape
    base = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    a = base.alias("a")
    b = base.hint("shuffle_hash").alias("b")
    joined = a.join(
        b, (F.col("a.k") == F.col("b.k")) & (F.col("a.id") < F.col("b.id"))
    ).select((F.col("a.id") + F.col("b.id")).alias("s"))
    agg = joined.agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("s").alias("chk"))
    row = agg.collect()[0]
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    reads = re.findall(r"AQEShuffleRead[\s\S]{0,200}?Arguments: ([^\n]+)", plan)
    print(f"n_pairs={row['n_pairs']} chk={row['chk']}")
    print(f"join=ShuffledHashJoin: {'ShuffledHashJoin' in plan}")
    print(f"exchange_reused: {'ReusedExchange' in plan}")
    print(f"aqe_shuffle_reads: {reads}")
    print(f"RECEIPT: skewed={any('skewed' in r for r in reads)}")


if __name__ == "__main__":
    main()
