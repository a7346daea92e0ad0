"""Round-16 fixes from the r15 ADVICE: Spark-exact removed-partition
path rendering with verified deletes, NULL-sentinel session paths,
NULL-distinguishing transition-stream state, and the format_contract
trailing-whitespace guard — plus the round's headline feature, GLOBAL
near-dedup under incremental curation via the persistent LSH index."""

import pytest
from pyspark.sql import functions as F

from petastorm_spark.session import arrow_local_df


def test_hive_part_segs_renders_like_spark(spark, tmp_path):
    """The r15 ADVICE medium: str() rendered bool True as 'True' where
    Spark writes 'true', and strings needing Hive escaping broke the
    path entirely — the removed-partition delete was then a silent
    no-op. The rendering must now match what partitionBy puts on disk
    for every supported type, and reject ambiguous types up front."""
    import datetime
    import glob
    import os

    from petastorm_spark.tools.curate import _hive_part_segs

    url = str(tmp_path / "render")
    df = arrow_local_df(
        spark,
        {
            "flag": [True, False, None],
            "day": [datetime.date(2026, 1, 2)] * 3,
            "name": ["plain", "a/b:c", "sp ace"],
            "n": [7, 8, 9],
            "x": [1, 2, 3],
        },
        "flag boolean, day date, name string, n bigint, x int",
    )
    df.write.partitionBy("flag", "day", "name", "n").parquet(url)
    on_disk = {
        os.path.relpath(os.path.dirname(f), url)
        for f in glob.glob(f"{url}/*/*/*/*/*.parquet")
    }
    rendered = {
        _hive_part_segs(
            ["flag", "day", "name", "n"],
            {"flag": r["flag"], "day": r["day"], "name": r["name"],
             "n": r["n"]},
        )
        for r in df.select("flag", "day", "name", "n").collect()
    }
    assert rendered == on_disk
    # ambiguous types are rejected up front, not guessed
    with pytest.raises(ValueError, match="engine-version-dependent"):
        _hive_part_segs(["f"], {"f": 1.5})
    with pytest.raises(ValueError, match="engine-version-dependent"):
        _hive_part_segs(["t"], {"t": datetime.datetime(2026, 1, 2, 3)})


def test_curate_incremental_removes_bool_and_escaped_partitions(
    spark, tmp_path_factory
):
    """End-to-end receipt for the same ADVICE item: a removed partition
    keyed by a BOOLEAN and by a string needing path escaping really
    disappears from the target (str() rendering used to silently leave
    both behind, then pin them forever by storing the manifest)."""
    from petastorm_spark.operators.layout import write_dataset_manifest
    from petastorm_spark.tools.curate import curate_incremental

    root = tmp_path_factory.mktemp("advdel")
    src, dst = str(root / "src"), str(root / "dst")

    def docs(keys):
        rows = [
            (b, s, f"d{b}-{s}-{i}", f"text {b} {s} {i} " + "word " * 12)
            for (b, s) in keys
            for i in range(6)
        ]
        return spark.createDataFrame(
            rows, "is_hq boolean, grp string, doc_id string, text string"
        )

    all_keys = [(True, "a/b"), (False, "plain"), (True, "plain")]
    docs(all_keys).write.partitionBy("is_hq", "grp").parquet(src)
    write_dataset_manifest(spark, src, ["is_hq", "grp"])
    c1 = curate_incremental(
        spark, src, dst, ["is_hq", "grp"], quality_floor=0.0
    )
    assert c1["partitions_added"] == 3

    # drop the bool=True/escaped-string partition from the source
    import shutil

    shutil.rmtree(f"{src}/is_hq=true/grp=a%2Fb")
    write_dataset_manifest(spark, src, ["is_hq", "grp"])
    c2 = curate_incremental(
        spark, src, dst, ["is_hq", "grp"], quality_floor=0.0
    )
    assert c2["partitions_removed"] == 1
    got = spark.read.parquet(dst)
    assert (
        got.where((F.col("is_hq") == True) & (F.col("grp") == "a/b")).count()  # noqa: E712
        == 0
    ), "removed partition survived — rendering mismatch"
    assert got.count() == 12


def test_format_contract_rejects_trailing_ws_final_in_set_value():
    """The r15 ADVICE low: 'in_set:col:a|b ' survives formatting but
    parse_contract strips entry ends, so the value round-trips as 'b'
    — a contract that rejects the rows it was profiled from. The
    formatter must refuse the un-round-trippable token."""
    from petastorm_spark.operators.profiling import (
        format_contract,
        parse_contract,
    )

    with pytest.raises(ValueError, match="trailing whitespace"):
        format_contract([("in_set", "col", ["a", "b "])])
    # interior trailing whitespace IS round-trippable and stays legal
    spec = format_contract([("in_set", "col", ["a ", "b"])])
    assert parse_contract(spec) == [("in_set", "col", ["a ", "b"])]


def test_session_paths_null_event_type_sentinel(spark, tmp_path):
    """The r15 ADVICE low: concat_ws SKIPS NULLs, so a NULL event_type
    inside a trigram collapsed to a 2-element path while the oracle's
    '||' NULL-propagated. Both engines now sentinel-coalesce: the NULL
    leg must appear as a chr(0) path element, not vanish."""
    from petastorm_spark.queries_llm import session_paths_topk

    url = str(tmp_path / "events.parquet")
    rows = [
        (1, i, f"2026-01-01 00:0{i}:00", t)
        for i, t in enumerate(["view", None, "buy", "view", None, "buy"])
    ]
    spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts_s string, event_type string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop(
        "ts_s"
    ).write.parquet(url)
    paths = {
        r["path"]: r["n"]
        for r in session_paths_topk(spark, str(tmp_path)).collect()
    }
    assert "view>\x00>buy" in paths, paths
    assert "view>buy" not in paths, "NULL leg collapsed (concat_ws skip)"


def test_transition_stream_null_event_type_matches_batch(
    spark, tmp_path_factory
):
    """The r15 ADVICE low: single-field state conflated 'no state yet'
    with 'last type was NULL', dropping the (NULL, next) pair the
    batch twin emits. Feed a NULL-type event through the stream and
    pin the pair set against lead() semantics."""
    from petastorm_spark.streaming.feed import transition_pairs_stream

    root = tmp_path_factory.mktemp("nulltrans")
    src = str(root / "ev")
    rows = [
        (1, 1, 1_000_000, "view"),
        (1, 2, 2_000_000, None),
        (1, 3, 3_000_000, "buy"),
        (2, 4, 1_000_000, None),
        (2, 5, 2_000_000, "view"),
    ]
    spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, t bigint, event_type string"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, t bigint, event_type string"
    ).parquet(src)
    out = transition_pairs_stream(stream, ts_col="t")
    q = (
        out.writeStream.format("memory")
        .queryName("nulltrans")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["prev_type"], r["next_type"])
        for r in spark.sql("select * from nulltrans").collect()
    }
    # batch lead() semantics: NULL next_type filtered, NULL prev kept
    assert got == {(1, None, "buy"), (2, None, "view")}
