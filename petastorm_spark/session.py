"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set fleet-wide on a real
cluster: AQE on (runtime coalescing + skew-join handling), Arrow for
any Python exchange, UTC session time, shuffle partitions sized to
the core count rather than Spark's legacy 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _shuffle_partitions(cpus: int) -> int:
    """Post-shuffle partition count. Local default = core count (one
    wave, minimal task overhead at bench scale). At data scale this
    MUST grow with input bytes, not cores: several operators pin
    ShuffledHashJoin for exchange reuse (dedup._pair_join,
    lsh_candidate_pairs, winnowing) and an SHJ build side holds one
    PARTITION of bucket rows in a per-task hash map — corpus/partitions
    rows. Size via SPARK_GRAFT_SHUFFLE_PARTITIONS to keep partitions in
    the 100-200 MB range (e.g. ~8000 for a 1 TB fingerprint exchange);
    AQE coalesces the small ones back down, and AQE skew-join splits
    oversized SHJ partitions at runtime (receipt:
    tools/skew_shj_receipt.py — the split fires on the pinned
    ReusedExchange self-join shape), so over-provisioning costs little
    while under-provisioning risks build-side OOM at 100 TB."""
    return int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus)))


def get_spark(app_name: str = "petastorm_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(_shuffle_partitions(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism floor for AQE coalescing: the default 1m floor
        # collapses a small-bytes shuffle to ONE post-shuffle task,
        # serializing compute-heavy stages whose cost is CPU, not IO
        # (measured: the applyInPandas EWMA fold ran 1-task/3.8s at
        # sf0.1 vs 15-task/0.9s at 10x the data). 256k keeps genuinely
        # tiny shuffles coalesced while letting compute-bound stages
        # use the cluster; irrelevant at 100 TB where shuffle sizes
        # dwarf any floor.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type — read as bigint ns-since-epoch and
        # convert with ns_to_timestamp() where needed.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4 wraps every Column/functions API call with a
        # call-site capture (traceback walk + 2 extra JVM round trips
        # to set/clear PySparkCurrentOrigin) so error messages can
        # point at user code. On wide-expression queries that is the
        # dominant CONSTRUCTION cost (measured: ~40% of the py4j
        # round trips building the 219-query registry). The flag is
        # read ONCE per process (errors.utils caches it at the first
        # wrapped call), so it must be set at builder time, not after.
        # SPARK_GRAFT_DF_DEBUG=true restores the friendlier errors.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
        # subset co-partitioning — see ensure_session_confs
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    # Long sessions accumulate resident pyspark.daemon workers: with
    # worker reuse every Arrow/Python-UDF stage can leave up to
    # `cpus` idle forked workers (~50-80 MB each once pandas is
    # loaded) pooled for the session's lifetime — ~2 GB at local[32]
    # after a full bench sweep. Spark 4's idleWorkerMaxPoolSize caps
    # that pool. Opt-in (env) rather than default: a cap makes every
    # later UDF stage re-fork + re-import pandas for the workers it
    # evicted, a wall-cost-per-stage vs resident-memory trade the
    # user should choose (on a real cluster it's per-executor, where
    # ~5 cores means ~5 workers and the default is fine).
    idle_pool = os.environ.get("SPARK_GRAFT_PY_IDLE_POOL")
    if idle_pool:
        builder = builder.config(
            "spark.python.factory.idleWorkerMaxPoolSize", idle_pool
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs this engine depends on to an
    EXTERNALLY-created session (e.g. the verification driver's).
    Without nanosAsLong, reading the TIMESTAMP(NANOS) events table
    throws PARQUET_TYPE_ILLEGAL; non-UTC session time would shift
    timestamp comparisons against the TZ-naive oracle.

    NB this intentionally MUTATES the caller's session (the settings
    must hold at execution time, which may be long after plan
    construction) — documented side effect, set only when differing to
    avoid repeated JVM round trips.
    """
    want = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.session.timeZone": "UTC",
        # Subset co-partitioning (the pre-3.3 behavior): a child already
        # hashpartitioned on a SUBSET of the join keys joins in place.
        # Several self-join operators are designed around this — e.g.
        # embedding_near_dup_pairs partitions on `bucket` once (window
        # + both join sides share the exchange) and joins on (bucket,
        # refine-subkey); with the default `true`, the planner inserts
        # a fresh (bucket, _sub) exchange per side and the shared-scan
        # design degrades to two full corpus evaluations.
        "spark.sql.requireAllClusterKeysForCoPartition": "false",
        # Construction-cost switch (see get_spark): only effective if
        # set before the process's first wrapped pyspark call — for an
        # external driver session that means this first _t() touch.
        # Harmless later (the python-side cache is already frozen).
        "spark.python.sql.dataFrameDebugging.enabled": os.environ.get(
            "SPARK_GRAFT_DF_DEBUG", "false"
        ),
    }
    for k, v in want.items():
        try:
            current = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            current = None
        if current != v:
            spark.conf.set(k, v)
    return spark


# Plans persist()ed on behalf of a LAZILY returned result (the operator
# cannot unpersist before the caller consumes it). Operators append here;
# callers release after consumption. `spark.catalog.clearCache()` (which
# bench.py runs between queries) also frees these — but a long-lived
# session that neither calls release_persisted() nor clearCache() would
# accumulate cached partitions until the ContextCleaner GCs the plans.
_PERSISTED: list = []


def register_persisted(df):
    """Track a DataFrame persist()ed for a lazily-returned result."""
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every intermediate an operator cached on behalf of a
    lazily-returned result; call once the results are consumed."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 - session may be gone
            pass
    return n


def arrow_local_df(spark: SparkSession, data: dict, schema: str):
    """createDataFrame for small driver-local tables via the
    pandas->Arrow path. A plain Row-list ``createDataFrame``
    parallelizes through pyspark.daemon, and with worker reuse every
    such call can leave up to ``defaultParallelism`` forked python
    workers (~58 MB each once warm) resident for the session's
    lifetime — measured 2.2 GB after one bench sweep at local[32]. The
    Arrow path converts driver-side and ships record batches straight
    to the JVM: zero python workers. ``data`` maps column name ->
    list of values (lists for array columns are fine)."""
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(data), schema=schema)


def events_ts_us(df, col: str = "ts"):
    """Epoch-microseconds bigint Column for an event-time column,
    robust to every layout the testdata has shipped:

    - bigint (TIMESTAMP(NANOS) parquet read under ``nanosAsLong``):
      nanoseconds-since-epoch -> ``div 1000``;
    - TIMESTAMP_NTZ (timestamp[us] parquet, Spark 4's default
      ``inferTimestampNTZ``): wall-clock microseconds via a tz-free
      ``timestampdiff`` against the NTZ epoch — matches DuckDB's
      ``epoch_us`` on its naive TIMESTAMP exactly, independent of the
      session time zone;
    - TIMESTAMP (ltz): instant-based ``unix_micros``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        TimestampNTZType,
        TimestampType,
    )

    dt = df.schema[col].dataType
    if isinstance(dt, (LongType, IntegerType)):
        return F.expr(f"{col} div 1000").cast("bigint")
    if isinstance(dt, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        ).cast("bigint")
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col))
    raise TypeError(f"unsupported event-time type for {col!r}: {dt}")


def ns_to_timestamp(col):
    """bigint nanoseconds-since-epoch -> TimestampType (microsecond
    precision, truncating — matches how DuckDB reads TIMESTAMP(NANOS))."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    # exact decimal division — double division loses precision on int64 nanos
    us = F.floor(c.cast("decimal(28,0)") / F.lit(1000)).cast("bigint")
    return F.timestamp_micros(us)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the testdata star schema as a dict of DataFrames."""
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
