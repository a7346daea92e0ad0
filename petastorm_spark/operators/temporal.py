"""Temporal join/rollup operators the reference engine lacks but a
time-series-heavy user expects (SURVEY §2.6 gap set: as-of join,
range/interval join, hypertable-style multi-granularity rollup).

All three are expressed so the physical plan survives 100 TB:

  - ``asof_join``: NO join at all — a union of the two sides and one
    window pass per key.  The naive formulation (theta-join on
    ``r.ts <= l.ts`` + argmax) is a BroadcastNestedLoopJoin that goes
    quadratic per key; the union-window form is one hash exchange on
    the key and a partition-local sort, identical cost to a windowed
    aggregation.
  - ``range_join_binned``: point-in-interval joins become equi-joins
    on a time bin, with intervals exploded to every bin they overlap
    and a residual exact filter after the match.  Spark otherwise
    plans an inequality join as a nested-loop; binning makes it
    shuffle-partitionable on both sides (the standard interval-join
    strategy in Flink/KDB-style engines).
  - ``rollup_time_grains``: one scan fanned out to N time
    granularities via explode — the "continuous aggregate ladder" of
    a hypertable, computed with map-side partial aggregation instead
    of N scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same key (``direction='backward'``;
    ``'forward'`` takes the earliest right row at-or-after).  Right
    rows must be unique per (key, ts) — pre-aggregate otherwise.

    Output: every left column, plus each ``right_value_cols`` entry as
    ``asof_<name>`` and the matched right timestamp ``asof_{ts_col}``
    (nulls when no right row qualifies / tolerance exceeded).

    Scale: union the two sides, ONE hash exchange on ``key_col``, one
    partition-local sort, a single ``last(ignorenulls)`` running window
    over one packed struct — no join operator, so no nested loop and no
    candidate blowup.  A pathologically hot key serializes into one
    partition (same as any keyed window); salt upstream if a single
    key exceeds an executor.

    Row atomicity: the matched right row travels as ONE
    ``struct(_rts, *values)`` column through the window, so the output
    always carries the values of exactly the matched row — a NULL in
    one right value column stays NULL (DuckDB ASOF JOIN semantics:
    the row attaches verbatim), never back-filled from an older row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if "_rts" in right_value_cols:
        raise ValueError("right_value_cols may not contain the reserved name '_rts'")

    from pyspark.sql import types as T

    lcols = left.columns
    pack_type = T.StructType(
        [T.StructField("_rts", right.schema[ts_col].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    marked_l = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_rpack", F.lit(None).cast(pack_type)
    )

    marked_r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_is_left"),
        F.struct(
            F.col(ts_col).alias("_rts"),
            *[F.col(c).alias(c) for c in right_value_cols],
        ).alias("_rpack"),
    )
    for c in lcols:
        if c not in (key_col, ts_col):
            marked_r = marked_r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = marked_l.select(*lcols, "_is_left", "_rpack").unionByName(
        marked_r.select(*lcols, "_is_left", "_rpack")
    )

    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts => `<=` semantics
        w = (
            Window.partitionBy(key_col)
            .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(key_col)
            .orderBy(F.col(ts_col).desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    out = u.withColumn(
        "_m", F.last("_rpack", ignorenulls=True).over(w)
    ).where(F.col("_is_left") == 1)

    if tolerance_us is not None:
        gap = (
            F.col(ts_col) - F.col("_m._rts")
            if direction == "backward"
            else F.col("_m._rts") - F.col(ts_col)
        )
        out = out.withColumn(
            "_m",
            F.when(F.col("_m").isNotNull() & (gap <= tolerance_us), F.col("_m")),
        )

    return out.select(
        *lcols,
        F.col("_m._rts").alias(f"asof_{ts_col}"),
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_value_cols],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    interval_cols: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join (``start <= ts < end``) as a
    bin-bucketed equi-join: intervals explode to every ``bin_width``
    bucket they overlap, points map to their single bucket, the join
    is an equi-join on the bucket, and an exact residual filter
    removes edge overshoot.  Timestamps and bounds are integral
    (epoch-µs or any monotone int).

    Scale: both sides shuffle-partition on the bin key, so a big-big
    range join parallelizes instead of falling into Spark's
    BroadcastNestedLoopJoin; interval explosion is
    ``ceil(span/bin_width)`` rows per interval — pick ``bin_width`` of
    the order of the median interval span.  (Catalyst cannot derive
    this rewrite itself; this operator IS the optimization.)
    """
    interval_cols = interval_cols or [
        c for c in intervals.columns if c not in (start_col, end_col)
    ]
    bin_width = int(bin_width)
    # Integer `div`, not double division + cast: double quotients lose
    # integer precision past 2^53 (a point could land in a bin the
    # interval never exploded to, silently dropping a true match).
    # Inverted intervals (end <= start) are dropped up front — they
    # match nothing, and a descending sequence() would explode junk.
    binned_iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"`{start_col}` div {bin_width}"),
                # end is exclusive: a bound on a bin edge adds no bin
                F.expr(f"(`{end_col}` - 1) div {bin_width}"),
            )
        ),
    )
    binned_pt = points.withColumn(
        "_bin", F.expr(f"`{point_ts_col}` div {bin_width}")
    )
    joined = binned_pt.join(binned_iv, "_bin").where(
        (F.col(point_ts_col) >= F.col(start_col))
        & (F.col(point_ts_col) < F.col(end_col))
    )
    return joined.drop("_bin")


def rollup_time_grains(
    df: DataFrame,
    ts_us_col: str,
    grains_us: dict[str, int],
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Hypertable-style rollup ladder: the same aggregation at several
    time granularities (hour/day/week...) from ONE scan.  Emits
    ``grain`` (name) and ``bucket_us`` (grain-floored timestamp)
    alongside ``group_cols`` and the aggregate columns.

    Scale: the fan-out is an explode of len(grains) structs per row —
    map-side, before partial aggregation — so the shuffle carries only
    partially-aggregated (grain, bucket, groups) rows; N separate
    scans of a 100 TB table become one.
    """
    grain_structs = [
        F.struct(
            F.lit(name).alias("grain"),
            (F.expr(f"{ts_us_col} div {int(width)}") * int(width))
            .cast("bigint")
            .alias("bucket_us"),
        )
        for name, width in grains_us.items()
    ]
    fanned = df.withColumn("_g", F.explode(F.array(*grain_structs)))
    return (
        fanned.select(
            F.col("_g.grain").alias("grain"),
            F.col("_g.bucket_us").alias("bucket_us"),
            *[F.col(c) for c in group_cols],
            *[F.col(c) for c in df.columns if c not in group_cols],
        )
        .groupBy("grain", "bucket_us", *group_cols)
        .agg(*aggs)
    )


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: per user, how far through the event
    sequence ``steps`` they progressed, advancing a step only on an
    event of the right type STRICTLY AFTER the previous step's match
    (the standard product-analytics funnel; each step binds to its
    earliest eligible event). Output: (user, funnel_depth,
    t_step1..t_stepN epoch-values of the matched events, NULL past
    the reached depth). Every user in the input appears, depth 0 if
    they never fired step 1.

    Scale: ONE shuffle on the user key. Non-funnel event types are
    dropped map-side — the filter lives INSIDE ``collect_list`` (a
    ``when`` producing NULL, which collect_list skips), so partial
    aggregation ships only funnel-step events per user. The sequence
    scan itself is an in-JVM ``F.aggregate`` fold over the sorted
    per-user array (same zero-Python technique as the EWMA fold in
    queries.events_ewma_agg); per-user state is one small struct, so
    memory is bounded by funnel-events-per-user, not total events.
    A sequential scan is inherent to funnel semantics — the
    equivalent N-way min-join formulation costs N shuffles and N
    scans; this is one of each.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    ev = F.when(
        F.col(type_col).isin(list(steps)),
        F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")),
    )
    seq = df.groupBy(user_col).agg(
        F.array_sort(F.collect_list(ev)).alias("_seq")
    )
    init = F.struct(
        F.lit(0).alias("d"),
        *[F.lit(None).cast("bigint").alias(f"t{i}") for i in range(1, n + 1)],
    )

    def fold(acc, x):
        advance = F.lit(False)
        for i in range(n):
            prev = (
                F.lit(-1).cast("bigint")
                if i == 0
                else F.coalesce(acc[f"t{i}"], F.lit(-1))
            )
            advance = advance | (
                (acc["d"] == i) & (x["y"] == steps[i]) & (x["t"] > prev)
            )
        fields = [F.when(advance, acc["d"] + 1).otherwise(acc["d"]).alias("d")]
        for j in range(1, n + 1):
            fields.append(
                F.when(advance & (acc["d"] == j - 1), x["t"])
                .otherwise(acc[f"t{j}"])
                .alias(f"t{j}")
            )
        return F.struct(*fields)

    st = F.aggregate("_seq", init, fold)
    return seq.select(
        F.col(user_col),
        st["d"].cast("bigint").alias("funnel_depth"),
        *[st[f"t{i}"].alias(f"t_step{i}") for i in range(1, n + 1)],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval x interval OVERLAP join (half-open [start, end)) as a
    bin-bucketed equi-join — the two-sided sibling of
    :func:`range_join_binned`. Spark plans the raw theta join
    (``ls < re AND rs < le``) as a nested loop; here each side
    explodes its interval into the time bins it covers and pairs meet
    on an equi bin key, hash-partitionable on BOTH sides.

    Each overlapping pair is emitted EXACTLY ONCE with no distinct
    pass: a pair is accepted only in the overlap's first bin,
    ``floor(max(l_start, r_start) / bin_width)`` — a bin both sides
    necessarily cover (same first-match idea as the simhash minimal
    band). Inverted intervals (end <= start) are dropped before the
    explode; binning uses exact integer ``div``. Output: all left
    columns + all right columns (names must be disjoint).

    Scale: exchanges are on the 8-byte bin key; per-bin pair work is
    quadratic only within a bin, so pick ``bin_width`` near the median
    interval length (the standard interval-join granularity trade).
    """
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(f"column names must be disjoint, shared: {overlap_cols}")

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        b0 = F.expr(f"{s} div {bin_width}")
        b1 = F.expr(f"({e} - 1) div {bin_width}")
        return (
            df.where(F.col(e) > F.col(s))
            .withColumn("_bin", F.explode(F.sequence(b0, b1)))
        )

    a = binned(left, l_start, l_end)
    b = binned(right, r_start, r_end).withColumnRenamed("_bin", "_binr")
    first_bin = F.expr(
        f"greatest({l_start}, {r_start}) div {bin_width}"
    )
    out = (
        a.join(b, a["_bin"] == b["_binr"])
        .where(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("_bin") == first_bin)
        )
        .drop("_bin", "_binr")
    )
    return out


def interval_attribution(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_us: str,
    right_ts_us: str,
    window_us: int,
) -> DataFrame:
    """Attribution join: every right event is paired with the key's
    left events it follows within ``window_us`` (right.ts in
    (left.ts, left.ts + window]) — the click -> conversion credit
    assignment. Input timestamps are epoch-µs bigints (normalize with
    session.events_ts_us). Output: both rows' columns plus nothing
    else; callers aggregate credit as needed.

    Scale: ONE equi-join on the entity key with the time bound as a
    post-join residual — per-key event counts are bounded in real
    logs, so the join never degenerates; AQE's skew-join splits any
    hot key. The streaming twin (streaming/feed.attribution_stream)
    runs the same predicate as a watermarked stream-stream join whose
    state expires by the same window.
    """
    clash = (set(left.columns) & set(right.columns)) - {key_col}
    if clash:
        raise ValueError(
            f"interval_attribution: rename colliding non-key columns {sorted(clash)}"
        )
    return left.join(right, key_col).where(
        (F.col(right_ts_us) > F.col(left_ts_us))
        & (F.col(right_ts_us) <= F.col(left_ts_us) + F.lit(int(window_us)))
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: int,
    tiebreak_col: str,
    max_grid_points: int = 1_000_000,
    fill: str = "locf",
) -> DataFrame:
    """Gap-filled resampling with last-observation-carried-forward —
    the hypertable ``time_bucket_gapfill + locf`` pair (TimescaleDB's
    continuous-aggregate surface; reference engine has no temporal
    operators at all, SURVEY §2.6): each key's observations land in
    ``floor(ts / step) * step`` buckets, the LAST observation per
    bucket wins (ts, then ``tiebreak_col`` — deterministic under
    equal timestamps), every key's grid runs from its first to its
    last bucket with no holes, and empty buckets carry the previous
    value forward. Output: (key, grid_ts, value_ff, is_gap).
    ``ts_col`` must be an integer timeline (epoch microseconds by
    this repo's convention).

    Scale: the bucket collapse is one partially-aggregated groupBy
    (observations never reach the window); the grid explode is
    bounded by ``max_grid_points`` per key — a guard against a
    mis-unit ``step`` exploding 10^12 rows — enforced INSIDE the plan
    (a conditional ``raise_error`` on the per-key span before the
    sequence explode), so constructing the DataFrame stays lazy and
    the span table is computed once, not twice (r12 ADVICE: the old
    eager collect() guard ran a full Spark job at plan-construction
    time and re-aggregated the buckets in the returned plan). The
    violation surfaces at first materialization as a Spark
    SparkRuntimeException naming the offending key's point count.
    The forward fill is a running ``last(ignorenulls)`` over grid
    rows only, parallel in keys. First grid point is an observed
    bucket by construction, so value_ff is never NULL.

    ``fill``: "locf" (default) carries the last observation forward;
    "interp" linearly interpolates interior gaps between the previous
    and next OBSERVED buckets (trailing gaps still carry forward —
    there is nothing to interpolate toward). Interpolation is
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` over
    exact bigint time deltas — a fixed scalar expression, so the
    doubles are bit-reproducible across engines."""
    from pyspark.sql import Window

    bucket = F.expr(f"({ts_col} DIV {int(step)}) * {int(step)}")
    obs = (
        df.select(
            F.col(key_col),
            bucket.alias("_b"),
            F.struct(
                F.col(ts_col).alias("_t"),
                F.col(tiebreak_col).alias("_tb"),
                F.col(value_col).alias("_v"),
            ).alias("_s"),
        )
        .groupBy(key_col, "_b")
        .agg(F.max("_s").getField("_v").alias("_v_obs"))
    )
    span = obs.groupBy(key_col).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    # in-plan guard: _hi flows through a CASE that raises on any key
    # whose grid would exceed max_grid_points — checked on the span
    # rows the explode consumes anyway, zero extra passes, still lazy
    npts = F.expr(f"(_hi - _lo) DIV {int(step)} + 1")
    span = span.select(
        F.col(key_col),
        F.col("_lo"),
        F.when(npts <= F.lit(int(max_grid_points)), F.col("_hi"))
        .otherwise(
            F.raise_error(
                F.format_string(
                    "resample grid would reach %s points for one key "
                    f"(> max_grid_points={int(max_grid_points)}); "
                    "check the step unit",
                    npts.cast("string"),
                )
            )
        )
        .alias("_hi"),
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(step)))
        ).alias("grid_ts"),
    )
    j = grid.join(
        obs.withColumnRenamed("_b", "grid_ts"), [key_col, "grid_ts"], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_v = F.last("_v_obs", ignorenulls=True).over(w)
    if fill == "locf":
        filled = prev_v
    elif fill == "interp":
        wf = (
            Window.partitionBy(key_col)
            .orderBy("grid_ts")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_ts = F.when(F.col("_v_obs").isNotNull(), F.col("grid_ts"))
        prev_t = F.last(obs_ts, ignorenulls=True).over(w)
        next_v = F.first("_v_obs", ignorenulls=True).over(wf)
        next_t = F.first(obs_ts, ignorenulls=True).over(wf)
        frac = (F.col("grid_ts") - prev_t).cast("double") / (
            next_t - prev_t
        ).cast("double")
        filled = (
            F.when(F.col("_v_obs").isNotNull(), F.col("_v_obs"))
            .when(next_v.isNull(), prev_v)  # trailing gap: carry forward
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
    else:
        raise ValueError(f"unknown fill mode {fill!r}")
    return j.select(
        F.col(key_col),
        F.col("grid_ts"),
        filled.alias("value_ff"),
        F.col("_v_obs").isNull().cast("int").alias("is_gap"),
    )
