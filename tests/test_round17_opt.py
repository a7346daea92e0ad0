"""Round-17 optimization pins.

- simhash overflow guard (r16 verdict #5): the packed 20-bit vote
  lanes silently corrupt for a document with >= 2^20 distinct tokens;
  the r17 guard turns that silent corruption into a loud error while
  leaving every legal document's signature byte-identical.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_simhash_overflow_guard_fails_loudly(spark):
    from petastorm_spark.operators.dedup import _VOTE_FIELD, simhash

    # one synthetic doc with exactly 2^20 distinct tokens ("t0".."tN"),
    # built JVM-side so the driver never materializes the ~8 MB string
    n = 1 << _VOTE_FIELD
    docs = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda x: F.concat(F.lit("t"), x.cast("string")),
            ),
        ).alias("text"),
    )
    with pytest.raises(Exception, match="packed vote"):
        simhash(docs, "text", "doc_id").collect()


def test_simhash_guard_leaves_legal_docs_alone(spark):
    from petastorm_spark.session import arrow_local_df
    from petastorm_spark.operators.dedup import simhash

    docs = arrow_local_df(
        spark,
        {"doc_id": [1, 2], "text": ["alpha beta gamma", "alpha beta gamma"]},
        "doc_id bigint, text string",
    )
    rows = simhash(docs, "text", "doc_id").collect()
    sigs = {r["doc_id"]: r["simhash"] for r in rows}
    assert sigs[1] == sigs[2] and sigs[1] is not None
