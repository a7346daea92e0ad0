"""Tour of the data-governance surface on the sf0.001 testdata: the
blessed-snapshot workflow a 100 TB pipeline runs between versions —

1. profile the corpus (one scan) and SUGGEST the contract it satisfies;
2. write v1 as an engine dataset WITH the partition-digest manifest;
3. curate v2 behind the contract gate (violations would abort the
   write) and manifest it too;
4. diff the snapshots: schema drift from footers alone, partition
   triage from the stored manifests, row-level diff confined to the
   moved partitions;
5. curate INCREMENTALLY off the stored manifest: the first run
   processes everything, an appended source partition triggers work
   bounded by that partition, a no-change run is a no-op.

    PYTHONPATH=. python examples/governance_tour.py
"""

import tempfile

from pyspark.sql import functions as F

from petastorm_spark.etl.dataset_metadata import materialize_dataset
from petastorm_spark.operators.layout import snapshot_diff
from petastorm_spark.operators.profiling import (
    enforce_contract,
    profile_columns,
    schema_diff,
    suggest_constraints,
)
from petastorm_spark.session import get_spark
from petastorm_spark.unischema import Unischema

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("governance_tour")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    # 1. profile + suggested contract
    print("== column profile ==")
    profile_columns(docs).show(truncate=40)
    checks = suggest_constraints(docs, range_slack=0.1)
    print("suggested contract:")
    for c in checks:
        print("  ", c)

    root = tempfile.mkdtemp(prefix="governance_")
    v1, v2 = f"{root}/v1", f"{root}/v2"

    # 2. v1: blessed snapshot, manifested on its source partition
    schema = Unischema.from_spark_schema(docs.schema)
    with materialize_dataset(
        spark, v1, schema, manifest_part_cols=["source"]
    ):
        docs.write.mode("overwrite").partitionBy("source").parquet(v1)

    # 3. v2: one source re-edited + the contract enforced pre-write
    v2_docs = docs.withColumn(
        "text",
        F.when(F.col("source") == "src0", F.upper("text")).otherwise(
            F.col("text")
        ),
    )
    report = enforce_contract(v2_docs, checks)  # raises on violation
    print("contract on v2:", [(r["check"], r["column"]) for r in report])
    with materialize_dataset(
        spark, v2, schema, manifest_part_cols=["source"]
    ):
        v2_docs.write.mode("overwrite").partitionBy("source").parquet(v2)

    # 4. three-tier diff: schema (footers) -> partitions (manifests)
    #    -> rows (pruned to moved partitions only)
    print("schema drift:", schema_diff(spark, v1, v2))
    diff = snapshot_diff(spark, v1, v2, "doc_id", ["text", "lang"])
    print("row-level changes (moved partitions only):")
    diff.groupBy("status").count().show()

    # 5. manifest-driven incremental curation: only partitions whose
    # stored digest moved are re-read, re-curated, and re-written
    from petastorm_spark.operators.layout import write_dataset_manifest
    from petastorm_spark.tools.curate import curate_incremental

    cur = f"{root}/curated"
    c1 = curate_incremental(spark, v1, cur, ["source"], quality_floor=0.0)
    print("incremental run 1 (everything is new):", c1)
    extra = (
        docs.limit(20)
        .withColumn("source", F.lit("srcNEW"))
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    extra.write.mode("append").partitionBy("source").parquet(v1)
    write_dataset_manifest(spark, v1, ["source"])  # refresh the sidecar
    c2 = curate_incremental(spark, v1, cur, ["source"], quality_floor=0.0)
    print("incremental run 2 (one appended partition):", c2)
    assert c2["input"] == 20 and c2["partitions_added"] == 1
    c3 = curate_incremental(spark, v1, cur, ["source"], quality_floor=0.0)
    print("incremental run 3 (nothing moved):", c3)


if __name__ == "__main__":
    main()
