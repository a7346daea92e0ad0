"""Predicate surface tests (mirrors petastorm/tests/test_predicates.py
semantics: set membership, composition, deterministic splits)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from petastorm_spark.predicates import (
    filter_dataframe,
    in_intersection,
    in_lambda,
    in_negate,
    in_pseudorandom_split,
    in_reduce,
    in_set,
    md5_fraction,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_in_set_column_matches_pandas(lineitem):
    pred = in_set(["A"], "l_returnflag")
    n_col = lineitem.filter(pred.to_column()).count()
    pdf = lineitem.select("l_returnflag").toPandas()
    assert n_col == int(pred.do_include_pandas(pdf).sum())


def test_in_negate_and_reduce(lineitem):
    p = in_reduce(
        [in_set(["A"], "l_returnflag"), in_set(["F"], "l_linestatus")], "and"
    )
    n = lineitem.filter(p.to_column()).count()
    n2 = lineitem.filter(
        (F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F")
    ).count()
    assert n == n2
    total = lineitem.count()
    assert lineitem.filter(in_negate(p).to_column()).count() == total - n


def test_operators_sugar(lineitem):
    p = in_set(["A"], "l_returnflag") | in_set(["R"], "l_returnflag")
    assert lineitem.filter(p.to_column()).count() == lineitem.filter(
        F.col("l_returnflag").isin("A", "R")
    ).count()


def test_in_intersection(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"]), (3, [])], ["id", "tags"]
    )
    got = {
        r.id
        for r in df.filter(in_intersection(["b", "c"], "tags").to_column()).collect()
    }
    assert got == {1, 2}


def test_in_lambda_pandas_udf_fallback(lineitem):
    pred = in_lambda(["l_quantity"], lambda cols: cols["l_quantity"] > 25)
    n = filter_dataframe(lineitem, pred).count()
    assert n == lineitem.filter(F.col("l_quantity") > 25).count()
    assert n > 0


def test_pseudorandom_split_partitions_everything(spark, lineitem):
    fractions = [0.5, 0.3, 0.2]
    counts = []
    for i in range(3):
        p = in_pseudorandom_split(fractions, i, "l_orderkey")
        counts.append(lineitem.filter(p.to_column()).count())
    assert sum(counts) == lineitem.count()
    # roughly proportional
    total = sum(counts)
    for c, f in zip(counts, fractions):
        assert abs(c / total - f) < 0.1


def test_pseudorandom_split_key_stable(lineitem):
    """Same key always lands in the same subset, regardless of other rows."""
    p0 = in_pseudorandom_split([0.5, 0.5], 0, "l_orderkey")
    full = {
        r.l_orderkey
        for r in lineitem.filter(p0.to_column()).select("l_orderkey").collect()
    }
    half = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    sub = {
        r.l_orderkey
        for r in half.filter(p0.to_column()).select("l_orderkey").collect()
    }
    assert sub == {k for k in full if k % 2 == 0}


def test_split_matches_pandas_path(lineitem):
    p = in_pseudorandom_split([0.25, 0.75], 0, "l_orderkey")
    spark_keys = {
        r.l_orderkey
        for r in lineitem.filter(p.to_column()).select("l_orderkey").collect()
    }
    pdf = lineitem.select("l_orderkey").toPandas()
    mask = p.do_include_pandas(pdf)
    assert set(pdf["l_orderkey"][mask]) == spark_keys


def test_md5_fraction_range(spark):
    df = spark.range(1000).select(md5_fraction("id").alias("f"))
    row = df.agg(F.min("f").alias("lo"), F.max("f").alias("hi")).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0
