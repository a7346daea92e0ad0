"""Column->DNF filter compilation (round-2 verdict: no driver-local
materialization for comparison-only filters=Column readers)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from petastorm_spark.plans.filter_compile import column_to_dnf
from petastorm_spark.reader import make_batch_reader, make_reader


def test_compile_simple_comparisons(spark):
    assert column_to_dnf(F.col("x") > 5) == [[("x", ">", 5)]]
    assert column_to_dnf(F.col("x") <= 5) == [[("x", "<=", 5)]]
    assert column_to_dnf(F.col("x") == "a") == [[("x", "=", "a")]]
    assert column_to_dnf(F.col("x") != 5) == [[("x", "!=", 5)]]
    assert column_to_dnf(F.col("x").isin(1, 2)) == [[("x", "in", [1, 2])]]
    assert column_to_dnf(~F.col("x").isin(1, 2)) == [[("x", "not in", [1, 2])]]
    # literal-leading comparison flips
    assert column_to_dnf(F.lit(5) > F.col("x")) == [[("x", "<", 5)]]


def test_compile_and_or_distribution(spark):
    c = ((F.col("a") > 1) & (F.col("b") < 2)) | (F.col("c") == 3)
    assert column_to_dnf(c) == [
        [("a", ">", 1), ("b", "<", 2)],
        [("c", "=", 3)],
    ]
    # AND over OR distributes
    c2 = (F.col("a") > 1) & ((F.col("b") < 2) | (F.col("c") == 3))
    assert column_to_dnf(c2) == [
        [("a", ">", 1), ("b", "<", 2)],
        [("a", ">", 1), ("c", "=", 3)],
    ]


def test_compile_rejects_jvm_only(spark):
    import datetime

    assert column_to_dnf(F.col("s").contains("a")) is None
    assert column_to_dnf((F.col("x") % 2) == 0) is None
    assert column_to_dnf(F.col("x") + 1 > 2) is None
    assert column_to_dnf(F.col("a.b") > 1) is None  # struct field
    assert column_to_dnf(F.col("t") > datetime.datetime(2020, 1, 1)) is None
    assert column_to_dnf(F.col("x").isNull()) is None


def test_column_filter_streams_directly(spark, sf_dir):
    """A comparison Column filter must engage the direct tier (no
    tempdir materialization) and match the plan-tier result."""
    url = f"{sf_dir}/orders.parquet"
    flt = (F.col("o_totalprice") > 100000.0) & (F.col("o_orderstatus") == "F")
    with make_batch_reader(url, spark=spark, filters=flt) as r:
        assert r._direct_root is not None, "direct tier must engage"
        assert r._owned_cache is None, "no driver-local tempdir"
        got = sorted(
            int(k) for b in r for k in np.asarray(b.o_orderkey).ravel()
        )
    want = sorted(
        row.o_orderkey
        for row in spark.read.parquet(url).filter(flt).collect()
    )
    assert got == want and got


def test_residual_column_filter_requires_cache_dir(spark, sf_dir, tmp_path):
    url = f"{sf_dir}/nation.parquet"
    jvm_only = (F.col("n_nationkey") % 2) == 0
    with pytest.raises(ValueError, match="cache_dir"):
        make_reader(url, spark=spark, filters=jvm_only)
    # explicit durable cache_dir: allowed, correct rows
    with make_reader(
        url, spark=spark, filters=jvm_only, cache_dir=str(tmp_path / "c")
    ) as r:
        assert sorted(x.n_nationkey for x in r) == list(range(0, 25, 2))
