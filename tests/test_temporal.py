"""Temporal operators (as-of join, binned range join, rollup ladder),
document chunking, PII scrub, and the events_ts_us layout shim."""

import pytest
from pyspark.sql import functions as F

from petastorm_spark.operators.packing import chunk_documents
from petastorm_spark.operators.temporal import (
    asof_join,
    range_join_binned,
    rollup_time_grains,
)
from petastorm_spark.operators.text import pii_counts, scrub_pii


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 5, "c"), (2, 50, "d"), (1, 20, "e")],
        ["k", "ts", "tag"],
    )
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 20, 200.0), (3, 1, 999.0)], ["k", "ts", "v"]
    )
    return trades, quotes


def test_asof_backward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, "k", "ts", ["v"])
    got = {r.tag: (r.asof_ts, r.asof_v) for r in out.collect()}
    assert got == {
        "a": (8, 100.0),
        "b": (20, 200.0),
        "c": (None, None),  # no quote at-or-before ts=5
        "d": (None, None),  # key 2 has no quotes at all
        "e": (20, 200.0),  # equal ts counts (<= semantics)
    }


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, "k", "ts", ["v"], direction="forward")
    got = {r.tag: (r.asof_ts, r.asof_v) for r in out.collect()}
    assert got == {
        "a": (20, 200.0),
        "b": (None, None),  # nothing at-or-after 25
        "c": (8, 100.0),
        "d": (None, None),
        "e": (20, 200.0),
    }


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, "k", "ts", ["v"], tolerance_us=2)
    got = {r.tag: (r.asof_ts, r.asof_v) for r in out.collect()}
    # a: gap 2 ok; b: gap 5 > 2 nulled; e: gap 0 ok
    assert got["a"] == (8, 100.0)
    assert got["b"] == (None, None)
    assert got["e"] == (20, 200.0)


def test_asof_plan_has_no_join(spark, trades_quotes):
    """The 100 TB property: the as-of is a union + window, NOT a
    (nested-loop) join — there must be no join operator in the plan."""
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, "k", "ts", ["v"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_binned_matches_naive(spark):
    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], ["pid", "ts"]
    )
    iv = spark.createDataFrame(
        [(0, 10, 30, "w1"), (1, 25, 26, "w2"), (2, 90, 100, "w3"), (3, 40, 41, "w4")],
        ["iid", "s", "e", "name"],
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_binned(pts, iv, "ts", "s", "e", bin_width=8).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.crossJoin(iv)
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive and got


def test_range_join_binned_no_duplicate_matches(spark):
    """An interval spanning many bins must still match each point once."""
    pts = spark.createDataFrame([(1, 50)], ["pid", "ts"])
    iv = spark.createDataFrame([(0, 0, 1000)], ["iid", "s", "e"])
    rows = range_join_binned(pts, iv, "ts", "s", "e", bin_width=8).collect()
    assert len(rows) == 1


def test_rollup_time_grains_matches_separate_groupbys(spark):
    df = spark.createDataFrame(
        [(i, "t%d" % (i % 3), float(i), i * 1_000_000) for i in range(500)],
        ["i", "etype", "value", "ts_us"],
    ).select("etype", "value", "ts_us")
    grains = {"sec": 1_000_000, "minute": 60_000_000}
    out = rollup_time_grains(
        df, "ts_us", grains, ["etype"], [F.count(F.lit(1)).alias("n")]
    )
    got = {(r.grain, r.bucket_us, r.etype): r.n for r in out.collect()}
    for name, width in grains.items():
        sep = (
            df.withColumn("b", (F.expr(f"ts_us div {width}") * width).cast("bigint"))
            .groupBy("b", "etype")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        for r in sep.collect():
            assert got[(name, r.b, r.etype)] == r.n
    assert len(got) == sum(
        1
        for name, width in grains.items()
        for _ in df.select(
            (F.expr(f"ts_us div {width}")).alias("b"), "etype"
        ).distinct().collect()
    )


def test_chunk_documents_covers_all_tokens(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),
            (2, "single"),
            (3, " ".join(f"x{i}" for i in range(4))),  # exactly chunk_size
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, "text", "doc_id", chunk_size=4, overlap=1)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.n_tokens) for r in out.collect())
    )
    # doc 1: 10 tokens, step 3 -> ceil(9/3)=3 chunks: [0:4],[3:7],[6:10]
    assert [r for r in rows if r[0] == 1] == [(1, 0, 4), (1, 1, 4), (1, 2, 4)]
    # coverage: last chunk reaches token 10; overlap tokens shared
    assert [r for r in rows if r[0] == 2] == [(2, 0, 1)]
    assert [r for r in rows if r[0] == 3] == [(3, 0, 4)]


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, "text", "doc_id", chunk_size=4, overlap=4)


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at alice.smith+x@mail.example.org today"),
            (2, "call +1 555-123-4567 or 12 555-123-4567"),
            (3, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    out = df.select(
        "doc_id",
        *[c.alias(f"n_{n}") for n, c in pii_counts("text")],
        scrub_pii("text").alias("clean"),
    )
    got = {r.doc_id: r for r in out.collect()}
    assert (got[1].n_email, got[1].n_phone) == (1, 0)
    assert got[1].clean == "reach me at [EMAIL] today"
    assert (got[2].n_email, got[2].n_phone) == (0, 2)
    assert got[2].clean == "call [PHONE] or [PHONE]"
    assert (got[3].n_email, got[3].n_phone) == (0, 0)
    assert got[3].clean == "no pii here"


def test_events_ts_us_equivalent_across_layouts(spark):
    """The three historical events.ts layouts (bigint ns, NTZ, LTZ)
    all normalize to the same epoch-µs integers."""
    from petastorm_spark.session import events_ts_us

    base_us = [1_600_000_000_000_000, 1_600_000_123_456_789]
    ns_df = spark.createDataFrame(
        [(v * 1000,) for v in base_us], ["ts"]
    )
    # session tz is UTC (get_spark), so LTZ->NTZ keeps the wall clock
    ntz_df = spark.createDataFrame([(v,) for v in base_us], ["us"]).select(
        F.expr("cast(timestamp_micros(us) as timestamp_ntz)").alias("ts")
    )
    ltz_df = spark.createDataFrame([(v,) for v in base_us], ["us"]).select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    for df in (ns_df, ntz_df, ltz_df):
        got = sorted(r[0] for r in df.select(events_ts_us(df)).collect())
        assert got == sorted(base_us), df.schema


# ---------------------------------------------------------------------------
# Round-5 ADVICE regressions
# ---------------------------------------------------------------------------


def test_asof_attaches_matched_row_atomically(spark):
    """ADVICE r5 medium: per-column last(ignorenulls) windows could mix
    values from DIFFERENT right rows when the matched row holds a NULL.
    The matched row must attach verbatim (DuckDB ASOF semantics): its
    NULLs stay NULL, never back-filled from an older right row."""
    left = spark.createDataFrame([(1, 30, "t1")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, 10, 100.0, 7.0), (1, 20, None, 8.0)],
        "k bigint, ts bigint, bid double, ask double",
    )
    row = asof_join(left, right, "k", "ts", ["bid", "ask"]).collect()[0]
    # the ts=20 row matches; its bid is NULL and must STAY NULL (the
    # old per-column fill leaked bid=100.0 from the ts=10 row)
    assert (row.asof_ts, row.asof_bid, row.asof_ask) == (20, None, 8.0)


def test_asof_rejects_reserved_value_col(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="_rts"):
        asof_join(trades, quotes.withColumnRenamed("v", "_rts"), "k", "ts", ["_rts"])


def test_range_join_binned_drops_inverted_intervals(spark):
    """ADVICE r5 low: an inverted interval (end <= start) must match
    nothing — and must not explode a descending junk sequence()."""
    pts = spark.createDataFrame([(1, 50)], ["pid", "ts"])
    iv = spark.createDataFrame(
        [(0, 100, 0), (1, 50, 50), (2, 40, 60)], ["iid", "s", "e"]
    )
    got = {r.iid for r in range_join_binned(pts, iv, "ts", "s", "e", 8).collect()}
    assert got == {2}


def test_range_join_binned_exact_near_int64_edge(spark):
    """ADVICE r5 low: double-division binning loses integer precision
    past 2^53 and can drop a true match; integer `div` binning is
    exact at any epoch magnitude."""
    base = (1 << 60) + 123  # far beyond double's 53-bit integer range
    pts = spark.createDataFrame([(1, base)], "pid bigint, ts bigint")
    iv = spark.createDataFrame(
        [(0, base - 1, base + 1)], "iid bigint, s bigint, e bigint"
    )
    rows = range_join_binned(pts, iv, "ts", "s", "e", bin_width=1000).collect()
    assert [(r.pid, r.iid) for r in rows] == [(1, 0)]


def test_phone_pattern_matches_bare_numbers(spark):
    """ADVICE r5 low: a bare US number (no country code) is PII too."""
    df = spark.createDataFrame(
        [(1, "dial 555-123-4567 now"), (2, "+44 555-123-4567 intl")],
        ["doc_id", "text"],
    )
    out = df.select(
        "doc_id",
        *[c.alias(f"n_{n}") for n, c in pii_counts("text")],
        scrub_pii("text").alias("clean"),
    )
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].n_phone == 1 and got[1].clean == "dial [PHONE] now"
    assert got[2].n_phone == 1 and got[2].clean == "[PHONE] intl"


def test_funnel_steps_hand_computed(spark):
    from petastorm_spark.operators.temporal import funnel_steps

    rows = [
        # u1: full funnel, with noise + out-of-order input
        (1, 50, "view"), (1, 10, "signup"), (1, 30, "view"),
        (1, 20, "error"), (1, 40, "purchase"),
        # wait: purchase at 40 comes after view at 30 -> depth 3
        # u2: purchase BEFORE view -> stalls at depth 2
        (2, 10, "signup"), (2, 20, "purchase"), (2, 30, "view"),
        # u3: never signs up -> depth 0 even with later steps
        (3, 10, "view"), (3, 20, "purchase"),
        # u4: same-ts tie is NOT strictly after -> signup only
        (4, 10, "signup"), (4, 10, "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: r
        for r in funnel_steps(
            df, "user_id", "ts", "event_type",
            steps=["signup", "view", "purchase"],
        ).collect()
    }
    assert out[1]["funnel_depth"] == 3
    assert (out[1]["t_step1"], out[1]["t_step2"], out[1]["t_step3"]) == (10, 30, 40)
    assert out[2]["funnel_depth"] == 2
    assert out[2]["t_step3"] is None
    assert out[3]["funnel_depth"] == 0 and out[3]["t_step1"] is None
    assert out[4]["funnel_depth"] == 1

    import pytest

    with pytest.raises(ValueError):
        funnel_steps(df, "user_id", "ts", "event_type", steps=[])


def test_interval_overlap_join_exact_once_and_no_nested_loop(spark):
    from petastorm_spark.operators.temporal import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 100), (2, 200, 300), (3, 400, 390)],  # 3rd inverted: dropped
        ["aid", "a_s", "a_e"],
    )
    b = spark.createDataFrame(
        [(10, 50, 250),   # overlaps 1 and 2
         (11, 95, 105),   # overlaps 1 only (crosses a bin edge)
         (12, 300, 310),  # touches 2's end: half-open -> NO overlap
         (13, 1000, 1100)],
        ["bid", "b_s", "b_e"],
    )
    out = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bin_width=10)
    pairs = sorted((r["aid"], r["bid"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (2, 10)]  # each exactly once
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    import pytest

    with pytest.raises(ValueError):
        interval_overlap_join(
            a.withColumnRenamed("aid", "x"),
            b.withColumnRenamed("bid", "x"),
            "a_s", "a_e", "b_s", "b_e", 10,
        )


def test_cusum_scores_hand_computed(spark):
    from pyspark.sql import functions as F

    from petastorm_spark.operators.stateful import cusum_scores

    # deviations: +2 +3 -10 +4 -> prefix 2,5,-5,-1; runmin(le 0): 0,0,-5,-5
    # cusum: 2,5,0,4
    df = spark.createDataFrame(
        [(1, 10, 2), (1, 20, 3), (1, 30, -10), (1, 40, 4)],
        ["k", "ts", "dev"],
    )
    out = cusum_scores(df, "k", "ts", "dev", F.lit(0)).orderBy("ts").collect()
    assert [r["cusum"] for r in out] == [2, 5, 0, 4]
