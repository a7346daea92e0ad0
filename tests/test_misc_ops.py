"""Skew join, SQL surface, wide schemas, partition pruning."""

import pytest
from pyspark.sql import functions as F

from petastorm_spark.operators.skew import salted_join
from petastorm_spark.sql import register_tables


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    plain = li.join(part, li.l_partkey == part.p_partkey).count()
    salted = salted_join(li, part, "l_partkey", "p_partkey", salt=8).count()
    assert salted == plain


def test_salted_join_salt_one_degenerates(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    assert (
        salted_join(li, part, "l_partkey", "p_partkey", salt=1).count()
        == li.join(part, li.l_partkey == part.p_partkey).count()
    )


def test_sql_surface(spark, sf_dir):
    register_tables(spark, sf_dir, ["lineitem", "orders"])
    out = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """
    )
    assert out.count() == 5


def test_wide_schema_1000_columns(spark, tmp_path):
    """F3 fixture: 1000 int columns, projection + >255-field rows."""
    from petastorm_spark.reader import make_batch_reader, make_reader

    n_cols = 1000
    cols = [F.lit(0).alias("id")] + [
        (F.col("id0") * 10000 + i).alias(f"col_{i}") for i in range(n_cols)
    ]
    url = str(tmp_path / "wide")
    spark.range(10).withColumnRenamed("id", "id0").select(
        F.col("id0"), *[(F.col("id0") * 10000 + i).alias(f"col_{i}") for i in range(n_cols)]
    ).write.parquet(url)

    with make_reader(url, spark=spark) as r:
        row = next(iter(r))
        assert len(row._fields) == n_cols + 1  # >255 fields works on 3.11
    with make_batch_reader(url, spark=spark, schema_fields=["col_0", "col_999"]) as r:
        b = next(iter(r))
        assert set(b._fields) == {"col_0", "col_999"}


def test_partition_pruning_reaches_plan(spark, tmp_path):
    """P10: a filter on the hive partition column prunes partitions
    (PartitionFilters in the scan, not a post-scan Filter)."""
    url = str(tmp_path / "parts")
    spark.range(100).select(
        "id", (F.col("id") % 5).alias("pk")
    ).write.partitionBy("pk").parquet(url)
    df = spark.read.parquet(url).where(F.col("pk") == 3).select("id")
    from petastorm_spark.plans.checks import formatted_plan

    import re

    plan = formatted_plan(df)
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert re.search(r"\(pk#?\d* = 3\)", seg), seg
    assert df.count() == 20


def test_reader_on_hive_partitioned_dataset(spark, tmp_path):
    from petastorm_spark.predicates import in_set
    from petastorm_spark.reader import make_reader

    url = str(tmp_path / "hive_ds")
    spark.range(60).select("id", (F.col("id") % 3).cast("string").alias("pk")).write.partitionBy(
        "pk"
    ).parquet(url)
    # NB Spark's partition discovery type-infers pk=1 dirs as ints; the
    # reader matches that (predicate values must be ints too)
    with make_reader(url, spark=spark, predicate=in_set([1], "pk")) as r:
        rows = list(r)
    assert sorted(x.id for x in rows) == [i for i in range(60) if i % 3 == 1]
    assert all(x.pk == 1 for x in rows)


def test_hll_estimate_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from petastorm_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_registers,
    )

    # 2000 distinct keys in one group, standard error at p=10 ~ 3.3%
    df = spark.range(2000).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("k")
    )
    est = hll_distinct(df, "grp", "k", p=10).collect()[0]["hll_distinct"]
    assert abs(est - 2000) / 2000 < 0.10

    # mergeability: registers(A) ++ registers(B), max-merged, must give
    # the same estimate as registers over the union
    a = df.where(F.col("k").cast("long") < 1200)
    b = df.where(F.col("k").cast("long") >= 800)  # overlapping halves
    ra = hll_registers(a, "grp", "k", p=10)
    rb = hll_registers(b, "grp", "k", p=10)
    merged = (
        ra.unionByName(rb)
        .groupBy("grp", "bucket")
        .agg(F.max("M").alias("M"))
    )
    e_merged = hll_estimate(merged, "grp", p=10).collect()[0]["hll_distinct"]
    e_union = hll_distinct(df, "grp", "k", p=10).collect()[0]["hll_distinct"]
    assert e_merged == e_union

    import pytest

    with pytest.raises(ValueError):
        hll_registers(df, "grp", "k", p=2)


def test_cm_sketch_upper_bound_and_merge(spark):
    from pyspark.sql import functions as F

    from petastorm_spark.operators.sketch import cm_estimate, cm_sketch

    # skewed stream: key "hot" x500, 200 singletons
    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["k"])
    sk = cm_sketch(df, "k", w=64, d=4)
    assert sk.count() <= 64 * 4
    keys = df.distinct()
    est = {r["k"]: r["cm_count"] for r in cm_estimate(sk, keys, "k", w=64, d=4).collect()}
    true = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    # count-min never underestimates, and the hot key stays separable
    assert all(est[k] >= true[k] for k in true)
    assert est["hot"] >= 500 and est["hot"] < 560
    # merge = union + sum, identical to sketching the union
    a = spark.createDataFrame(rows[:300], ["k"])
    b = spark.createDataFrame(rows[300:], ["k"])
    merged = (
        cm_sketch(a, "k", w=64, d=4)
        .unionByName(cm_sketch(b, "k", w=64, d=4))
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    em = {r["k"]: r["cm_count"] for r in cm_estimate(merged, keys, "k", w=64, d=4).collect()}
    assert em == est

    import pytest

    with pytest.raises(ValueError):
        cm_sketch(df, "k", w=1)


def test_sql_functions_match_column_factories(spark, sf_dir):
    """The ps_* SQL functions give bit-identical results to the
    Column-factory implementations they mirror."""
    from pyspark.sql import functions as F

    from petastorm_spark.operators import text as T
    from petastorm_spark.predicates import md5_fraction
    from petastorm_spark.sql import register_sql_functions, register_tables

    names = register_sql_functions(spark)
    assert "ps_quality" in names
    register_tables(spark, sf_dir, ["documents"])

    via_sql = spark.sql("""
        SELECT doc_id, ps_token_count(text) AS n, ps_quality(text) AS q,
               ps_detect_language(text) AS lang, ps_fingerprint(text) AS fp,
               ps_scrub_pii(text) AS scrubbed,
               ps_md5_fraction(cast(doc_id AS STRING)) AS frac,
               ps_normalize_text(upper(text) || '!!') AS norm,
               ps_zorder2(doc_id % 1024, n_chars % 1024) AS z
        FROM documents
    """).collect()
    from petastorm_spark.operators.layout import zorder_value

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    via_col = d.select(
        "doc_id",
        T.token_count("text").alias("n"),
        T.quality_score("text").alias("q"),
        T.detect_language("text").alias("lang"),
        T.fingerprint("text").alias("fp"),
        T.scrub_pii("text").alias("scrubbed"),
        md5_fraction(F.col("doc_id")).alias("frac"),
        T.normalize_text(
            F.concat(F.upper("text"), F.lit("!!"))
        ).alias("norm"),
        zorder_value(
            [F.col("doc_id") % 1024, F.col("n_chars") % 1024], bits=10
        ).alias("z"),
    ).collect()
    a = {r["doc_id"]: r for r in via_sql}
    b = {r["doc_id"]: r for r in via_col}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["n"] == b[k]["n"]
        assert a[k]["q"] == b[k]["q"]  # bit-identical doubles
        assert a[k]["lang"] == b[k]["lang"]
        assert a[k]["fp"] == b[k]["fp"]
        assert a[k]["scrubbed"] == b[k]["scrubbed"]
        assert a[k]["frac"] == b[k]["frac"]
        assert a[k]["norm"] == b[k]["norm"]
        assert a[k]["z"] == b[k]["z"]


def test_key_skew_report_detects_hot_key(spark):
    from petastorm_spark.operators.diagnostics import key_skew_report

    rows = [("hot",)] * 900 + [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["k"])
    rep = key_skew_report(df, "k", top_n=5).collect()
    assert len(rep) == 5
    top = rep[0]
    assert top["rank"] == 1 and top["key"] == "hot"
    assert top["frac"] == 0.9 and top["n_keys"] == 101
    # heavily skewed -> entropy ratio well below 1
    assert top["entropy_ratio"] < 0.3
    # cumulative share is monotone
    cums = [r["cum_frac"] for r in rep]
    assert cums == sorted(cums)

    # uniform key -> entropy ratio ~1
    uni = spark.createDataFrame([(f"k{i % 50}",) for i in range(1000)], ["k"])
    r2 = key_skew_report(uni, "k", top_n=3).collect()[0]
    assert r2["entropy_ratio"] > 0.99

    import pytest

    with pytest.raises(ValueError):
        key_skew_report(df, "k", top_n=0)
