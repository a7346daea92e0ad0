"""Round-15 fixes from the r14 ADVICE: nullable-safe constraint
suggestion, truncating (never padding) hierarchical probes, guarded
manifest reads, all-NULL-class t-closeness suppression semantics, and
the curate contract-gate persist leak."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from petastorm_spark.session import arrow_local_df


def test_suggest_constraints_nullable_roundtrip(spark):
    """The r14 ADVICE medium: range/in_set count NULL as a violation,
    so suggesting them for a NULLABLE column broke the documented
    enforce_contract(blessed, suggest_constraints(blessed)) roundtrip.
    Now nullable columns only get the checks they actually satisfy."""
    from petastorm_spark.operators.profiling import (
        enforce_contract,
        suggest_constraints,
    )

    blessed = arrow_local_df(
        spark,
        {
            "id": [1, 2, 3, 4],
            "lang": ["en", None, "en", "de"],     # nullable low-card str
            "score": [0.1, None, 0.5, 0.3],       # nullable numeric
            "n": [10, 20, 30, 40],                # null-free numeric
        },
        "id bigint, lang string, score double, n bigint",
    )
    checks = suggest_constraints(blessed)
    kinds = {(c[0], c[1]) for c in checks}
    # nullable columns: no range/in_set suggestion (NULL would violate)
    assert ("range", "score") not in kinds
    assert ("in_set", "lang") not in kinds
    # null-free columns still get their range
    assert ("range", "n") in kinds and ("range", "id") in kinds
    assert ("not_null", "score") not in kinds
    # THE guarantee: the blessed data passes its own suggested contract
    rows = enforce_contract(blessed, checks)
    assert all(r["passed"] for r in rows)


def test_hierarchical_probe_truncates_never_pads(spark):
    """The r14 ADVICE: a signature group with fewer than n_probe member
    centroids used to PAD _cells by repeating the last cell; knn_graph
    explodes _cells without distinct, so the duplicate probe row
    doubled that cell's members as candidates and one neighbor could
    take two of the top-k ranks. Now _cells is variable-length: every
    row's probe list is duplicate-free."""
    from petastorm_spark.operators.similarity import (
        probe_cells_hierarchical,
    )

    rng = np.random.default_rng(15)
    # 9 centroids -> n_l1 = max(4, ceil(sqrt(9))) = 4 L1 groups; with
    # l1_probe=1 a group with < n_probe members forces truncation
    cents = rng.normal(size=(9, 6))
    vecs = np.concatenate([c + 0.01 * rng.normal(size=(5, 6)) for c in cents])
    emb = arrow_local_df(
        spark,
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [list(map(float, v)) for v in vecs],
        },
        "vec_id bigint, embedding array<double>",
    )
    crows = arrow_local_df(
        spark,
        {
            "cell": list(range(9)),
            "cent_vec": [list(map(float, c)) for c in cents],
        },
        "cell int, cent_vec array<double>",
    ).collect()
    out = probe_cells_hierarchical(
        emb, crows, "vec_id", "embedding", n_probe=5, l1_probe=1
    ).collect()
    assert len(out) == len(vecs)
    saw_short = False
    for r in out:
        cells = r["_cells"]
        assert len(cells) == len(set(cells)), f"duplicate probe: {cells}"
        assert 1 <= len(cells) <= 5
        saw_short = saw_short or len(cells) < 5
    # the fixture must actually exercise the truncation branch
    assert saw_short, "no signature group was smaller than n_probe"


def test_knn_graph_hier_ranks_are_distinct_neighbors(spark):
    """End-to-end receipt for the same ADVICE item: under a
    deliberately starved l1_probe, knn_graph(hierarchical=True) must
    never list the same neighbor at two ranks of one query."""
    from petastorm_spark.operators.similarity import knn_graph

    rng = np.random.default_rng(16)
    vecs = rng.normal(size=(120, 6))
    emb = arrow_local_df(
        spark,
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [list(map(float, v)) for v in vecs],
        },
        "vec_id bigint, embedding array<double>",
    )
    g = knn_graph(
        emb, k=3, n_cells=9, n_probe=5, hierarchical=True, l1_probe=1
    )
    dup = (
        g.groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0


def test_snapshot_diff_rejects_empty_and_legacy_manifests(
    spark, tmp_path_factory
):
    """The r14 ADVICE: an empty _ps_manifest raised TypeError on
    first()[...] and a pre-r14 sidecar (no _manifest_key column)
    raised an opaque AnalysisException. Both now get a descriptive
    ValueError naming write_dataset_manifest."""
    from petastorm_spark.operators.layout import (
        MANIFEST_DIRNAME,
        snapshot_diff,
        write_dataset_manifest,
    )

    root = tmp_path_factory.mktemp("manifguard")
    good = str(root / "good")
    legacy = str(root / "legacy")
    df = spark.createDataFrame(
        [(p, i, f"v{p}-{i}") for p in range(2) for i in range(3)],
        "part int, id bigint, v string",
    )
    for url in (good, legacy):
        df.write.mode("overwrite").partitionBy("part").parquet(url)
    write_dataset_manifest(spark, good, ["part"])

    # legacy sidecar: manifest parquet WITHOUT the _manifest_key column
    spark.createDataFrame([(0, "d0")], "part int, digest string").write.mode(
        "overwrite"
    ).parquet(legacy + "/" + MANIFEST_DIRNAME)
    with pytest.raises(ValueError, match="write_dataset_manifest"):
        snapshot_diff(spark, good, legacy, "id", ["v"])

    # empty sidecar: schema-only manifest, zero rows
    spark.createDataFrame(
        [], "part int, digest string, _manifest_key string"
    ).write.mode("overwrite").parquet(legacy + "/" + MANIFEST_DIRNAME)
    with pytest.raises(ValueError, match="empty"):
        snapshot_diff(spark, good, legacy, "id", ["v"])


def test_suppress_low_closeness_keeps_all_null_classes(spark):
    """The r14 ADVICE: a QI class whose sensitive values are ALL
    NULL/NaN never enters t_closeness_report (its base excludes
    null/NaN), so the left-semi join silently dropped it despite the
    docstring's keep-with-class promise. Such classes carry no
    orderable distribution to attack — they are now kept."""
    from petastorm_spark.operators.privacy import suppress_low_closeness

    df = arrow_local_df(
        spark,
        {
            # class "a": balanced sensitive values (safe); class "z":
            # all-NULL sensitive (must be KEPT, not silently dropped)
            "qi": ["a"] * 8 + ["z"] * 4,
            "sal": [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]
            + [None, None, float("nan"), None],
        },
        "qi string, sal double",
    )
    kept = suppress_low_closeness(df, ["qi"], "sal", t=0.9)
    by_class = {
        r["qi"]: r["n"]
        for r in kept.groupBy("qi").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_class.get("z") == 4, by_class
    assert by_class.get("a") == 8, by_class


def test_curate_contract_failure_unpersists(spark, sf_dir, tmp_path):
    """The r14 ADVICE: the contract gate persisted the output frame
    BEFORE the try/finally, so a ContractViolationError leaked the
    full curated corpus into the session cache. The finally now wraps
    the gate itself."""
    from petastorm_spark.operators.profiling import ContractViolationError
    from petastorm_spark.tools.curate import curate

    jsc = spark.sparkContext._jsc  # JavaSparkContext: java.util.Map

    def rdd_ids():
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    before = rdd_ids()
    with pytest.raises(ContractViolationError):
        curate(
            spark,
            f"{sf_dir}/documents.parquet",
            str(tmp_path / "curated_leak"),
            quality_floor=0.0,
            contract="range:n_chars:1:2",
        )
    # no NEW rdd survives the failed gate (pre-existing localCheckpoint
    # rdds from other tests may linger until the context cleaner runs)
    leaked = rdd_ids() - before
    assert not leaked, (
        f"contract failure must unpersist the curated frame: {leaked}"
    )


def test_format_contract_roundtrips_through_parse(spark):
    """format_contract is parse_contract's inverse: a suggested
    contract prints to the CLI grammar and parses back to the same
    checks — the one-call drift gate's serialization leg."""
    from petastorm_spark.operators.profiling import (
        format_contract,
        parse_contract,
    )

    checks = [
        ("not_null", "doc_id"),
        ("unique", "doc_id"),
        ("range", "n_chars", 1.0, 4096.0),
        ("in_set", "lang", ["de", "en", "fr"]),
        ("regex", "doc_id", "^doc:[0-9]+$"),  # colons survive in regex
    ]
    spec = format_contract(checks)
    assert parse_contract(spec) == checks
    with pytest.raises(ValueError, match="grammar-safe"):
        format_contract([("in_set", "lang", ["a|b"])])


def test_curate_suggest_contract_from_blessed(spark, sf_dir, tmp_path):
    """The r14 verdict's #3 wired end to end: ONE curate call profiles
    a blessed snapshot, derives its contract, and gates the new write
    on it — passing when the new corpus fits the blessed envelope,
    aborting (nothing published) when it drifted outside it."""
    from petastorm_spark.operators.profiling import ContractViolationError
    from petastorm_spark.tools.curate import curate

    src = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(src)
    # blessed snapshot that the full corpus FITS: same envelope
    blessed_ok = str(tmp_path / "blessed_ok")
    docs.write.parquet(blessed_ok)
    dst = str(tmp_path / "curated")
    counts = curate(
        spark, src, dst,
        quality_floor=0.0,
        suggest_contract_from=blessed_ok,
        suggest_cols=["doc_id", "n_chars", "lang"],
    )
    assert counts["output"] > 0
    assert spark.read.parquet(dst).count() == counts["output"]

    # blessed snapshot with a NARROWER n_chars envelope: the curated
    # corpus drifts outside it -> the gate aborts before publishing
    lo, hi = docs.agg(
        F.min("n_chars"), F.max("n_chars")
    ).first()
    assert hi > lo  # fixture sanity: a narrowable envelope exists
    blessed_narrow = str(tmp_path / "blessed_narrow")
    docs.where(F.col("n_chars") < (lo + hi) / 2).write.parquet(blessed_narrow)
    dst_fail = str(tmp_path / "curated_fail")
    import os

    with pytest.raises(ContractViolationError, match="range"):
        curate(
            spark, src, dst_fail,
            quality_floor=0.0,
            suggest_contract_from=blessed_narrow,
            suggest_cols=["doc_id", "n_chars"],
        )
    assert not os.path.exists(dst_fail)


def test_curate_incremental_bounded_by_changed_partitions(
    spark, tmp_path_factory
):
    """The r14 verdict's #4: manifest-driven incremental curation.
    An appended source partition triggers work bounded by THAT
    partition (the attrition report's input count is the receipt),
    unchanged target partitions' files are never rewritten (mtime
    receipt), a changed partition is re-curated in place, and a
    removed partition is dropped from the target."""
    import glob
    import os
    import shutil

    from petastorm_spark.operators.layout import write_dataset_manifest
    from petastorm_spark.tools.curate import curate_incremental

    root = tmp_path_factory.mktemp("inccur")
    src = str(root / "src")
    dst = str(root / "dst")

    def docs(parts, salt=""):
        rows = [
            (p, f"d{p}-{i}", f"unique text {salt}{p} {i} " + "word " * 12)
            for p in parts
            for i in range(10)
        ]
        return spark.createDataFrame(
            rows, "src_part int, doc_id string, text string"
        )

    docs([0, 1, 2]).write.partitionBy("src_part").parquet(src)
    write_dataset_manifest(spark, src, ["src_part"])

    # run 1: first run curates everything
    c1 = curate_incremental(
        spark, src, dst, ["src_part"], quality_floor=0.0
    )
    assert c1["partitions_added"] == 3 and c1["partitions_removed"] == 0
    assert c1["input"] == 30
    assert spark.read.parquet(dst).count() == c1["output"] > 0

    def part_files(p):
        return sorted(glob.glob(f"{dst}/src_part={p}/*.parquet"))

    untouched = {p: [(f, os.path.getmtime(f)) for f in part_files(p)]
                 for p in (1, 2)}

    # append partition 3 and refresh the source manifest
    docs([3]).write.mode("append").partitionBy("src_part").parquet(src)
    write_dataset_manifest(spark, src, ["src_part"])
    c2 = curate_incremental(
        spark, src, dst, ["src_part"], quality_floor=0.0
    )
    assert c2["partitions_added"] == 1 and c2["partitions_changed"] == 0
    assert c2["input"] == 10, "work must be bounded by the new partition"
    assert spark.read.parquet(dst).where(
        F.col("src_part") == 3
    ).count() > 0
    for p, files in untouched.items():
        assert [(f, os.path.getmtime(f)) for f in part_files(p)] == files, (
            f"unchanged target partition {p} was rewritten"
        )

    # change partition 0 (new digest) and remove partition 2
    shutil.rmtree(f"{src}/src_part=0")
    shutil.rmtree(f"{src}/src_part=2")
    docs([0], salt="edited-").write.mode("append").partitionBy(
        "src_part"
    ).parquet(src)
    write_dataset_manifest(spark, src, ["src_part"])
    c3 = curate_incremental(
        spark, src, dst, ["src_part"], quality_floor=0.0
    )
    assert c3["partitions_changed"] == 1 and c3["partitions_removed"] == 1
    assert c3["input"] == 10
    got = spark.read.parquet(dst)
    assert got.where(F.col("src_part") == 2).count() == 0, "removed"
    assert (
        got.where(
            (F.col("src_part") == 0)
            & F.col("text").contains("edited-")
        ).count()
        > 0
    ), "changed partition re-curated"

    # no-op run: nothing moved, nothing processed
    c4 = curate_incremental(
        spark, src, dst, ["src_part"], quality_floor=0.0
    )
    assert c4 == {
        "partitions_added": 0,
        "partitions_changed": 0,
        "partitions_removed": 0,
    }


def test_transition_pairs_stream_matches_batch(
    spark, sf_dir, tmp_path_factory
):
    """availableNow over a static events dir == the batch lead() pair
    extraction: counting the stream's emitted (prev_type, next_type)
    pairs reproduces event_transition_matrix's n_trans exactly (the
    streaming-twin contract; state = ONE last-type value per user)."""
    from petastorm_spark.queries_llm import event_transition_matrix
    from petastorm_spark.session import events_ts_us
    from petastorm_spark.streaming.feed import (
        stream_dataset,
        transition_pairs_stream,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    evb = ev.withColumn("ts_us", events_ts_us(ev))
    d = str(tmp_path_factory.mktemp("tps") / "events")
    evb.select("user_id", "ts_us", "event_id", "event_type").coalesce(
        1
    ).write.parquet(d)

    q = (
        transition_pairs_stream(
            stream_dataset(spark, d), "user_id", "ts_us", "event_id",
            "event_type",
        )
        .writeStream.format("memory")
        .queryName("tps_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.table("tps_out")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r["prev_type"], r["next_type"]): r["n_trans"]
        for r in event_transition_matrix(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_l1_refinement_lifts_hierarchical_agreement(spark):
    """The r15 L1 upgrade: probe_cells_hierarchical's coarse level is
    now refined by deterministic spherical k-means over the centroid
    matrix (l1_rounds, default 4) instead of staying the raw lowest-id
    centroids. On clustered data where the lowest-id L1 grouping is
    incoherent, the refined level must agree with the exact flat
    assignment strictly more often — and stay deterministic."""
    from petastorm_spark.operators.similarity import (
        _probe_cells_numpy,
        probe_cells_hierarchical,
    )

    rng = np.random.default_rng(17)
    centers = rng.normal(size=(1024, 64)) * 10.0
    assign = rng.integers(0, 1024, size=1500)
    pts = centers[assign] + rng.normal(size=(1500, 64)) * 0.5
    emb = arrow_local_df(
        spark,
        {
            "vec_id": list(range(len(pts))),
            "embedding": [list(map(float, v)) for v in pts],
        },
        "vec_id bigint, embedding array<double>",
    )
    crows = arrow_local_df(
        spark,
        {
            "cell": list(range(1024)),
            "cent_vec": [list(map(float, c)) for c in centers],
        },
        "cell int, cent_vec array<double>",
    ).collect()

    def homes(rounds):
        return {
            r["vec_id"]: r["_cells"][0]
            for r in probe_cells_hierarchical(
                emb, crows, "vec_id", "embedding", 1,
                l1_probe=1, keep_order=True, l1_rounds=rounds,
            ).collect()
        }

    flat = {
        r["vec_id"]: r["_cells"][0]
        for r in _probe_cells_numpy(
            emb, crows, "vec_id", "embedding", 1, True
        ).collect()
    }

    def agree(h):
        return sum(1 for k in flat if flat[k] == h[k]) / len(flat)

    raw, refined = agree(homes(0)), agree(homes(4))
    assert refined - raw > 0.02, (raw, refined)
    assert refined >= 0.97, refined
    assert homes(4) == homes(4)  # deterministic


def test_knn_graph_append_hierarchical_uses_build_probe(spark, tmp_path):
    """The r15 review fix: knn_graph.json now records the probe
    configuration (hierarchical / l1_probe / l1_rounds) and
    knn_graph_append probes new batches with the BUILD's probe — a
    flat exact probe of a hierarchical index would assign different
    cells than the build did (and cannot run at all past the
    flat-quantizer ceiling). Append == full rebuild under the same
    hierarchical configuration."""
    from petastorm_spark.operators.similarity import (
        knn_graph,
        knn_graph_append,
        knn_graph_read,
        knn_graph_write,
    )

    rng = np.random.default_rng(18)
    centers = rng.normal(size=(12, 8)) * 10.0
    vecs = np.concatenate(
        [c + 0.1 * rng.normal(size=(10, 8)) for c in centers]
    )
    full = arrow_local_df(
        spark,
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [list(map(float, v)) for v in vecs],
        },
        "vec_id bigint, embedding array<double>",
    )
    initial = full.where(F.col("vec_id") < 100)
    batch = full.where(F.col("vec_id") >= 100)

    url = str(tmp_path / "kg_hier")
    knn_graph_write(
        url, initial, k=3, n_cells=12, n_probe=2,
        hierarchical=True, l1_probe=2, l1_rounds=4,
    )
    params, _ = knn_graph_read(spark, url)
    assert params["hierarchical"] is True
    assert params["l1_probe"] == 2 and params["l1_rounds"] == 4

    knn_graph_append(spark, url, batch)
    _, edges = knn_graph_read(spark, url)
    want = knn_graph(
        full, k=3, n_cells=12, n_probe=2,
        hierarchical=True, l1_probe=2, l1_rounds=4,
    )

    def tup(df):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"],
             round(r["cos_sim"], 4))
            for r in df.collect()
        )

    assert tup(edges) == tup(want)


def test_session_paths_single_user_exchange(spark, sf_dir):
    """Regression pin for the r15 decade-receipt finding: the trigram
    leads must ride the SAME user_id window as the session ids — a
    per-(user, sess) window re-exchanged and re-sorted the corpus and
    measured 2x the decade ratio. The corpus may be hash-exchanged on
    user_id exactly ONCE and never on (user_id, sess); the remaining
    exchanges (path-count partial agg, single-partition top-k) operate
    on the bounded K^3 path table."""
    import re

    from petastorm_spark.queries_llm import session_paths_topk

    plan = (
        session_paths_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    parts = re.findall(r"hashpartitioning\([^)]*\)", plan)
    on_user = [p for p in parts if "user_id" in p]
    assert len(on_user) == 1, parts
    assert not any("sess" in p for p in parts), parts
