"""Bucketed joins: the exchange disappears from the plan."""

import pytest
from pyspark.sql import functions as F

from petastorm_spark.etl.bucketing import bucketed_join_ready, write_bucketed
from petastorm_spark.plans.checks import formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    # clear stale catalog entries AND warehouse dirs from prior sessions
    # (warehouse path from the session conf — cwd-relative would miss)
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "o_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucket_metadata_present(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    assert bucketed_join_ready(spark, li_t)
    assert bucketed_join_ready(spark, o_t)


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    orders = spark.table(o_t)
    # hint('merge'): at test scale Catalyst would broadcast; at 100 TB
    # both sides are big and SMJ is what bucketing optimizes
    joined = li.hint("merge").join(
        orders, li.l_orderkey == orders.o_orderkey
    ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    plan = formatted_plan(joined)
    # bucketed SMJ: no exchange on either join key — only the final
    # small agg exchanges
    assert "SortMergeJoin" in plan
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan

    # same merge join on plain parquet DOES exchange both sides
    li_p = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o_p = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = li_p.hint("merge").join(o_p, li_p.l_orderkey == o_p.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    plain_plan = formatted_plan(plain)
    assert "hashpartitioning(l_orderkey" in plain_plan

    # results identical
    a = {(r.o_orderpriority, r.n) for r in joined.collect()}
    b = {(r.o_orderpriority, r.n) for r in plain.collect()}
    assert a == b
