"""Audit every registered query's output schema for driver-hashability.

The driver's correctness harness canonicalizes results in pandas by
sorting every column and hashing cell values; array / map / struct
cells are unhashable there and red-row the query even when values are
hash-exact against the oracle (see round-6 `inverted_index_terms`).
This script builds each query's DataFrame at sf0.001 (analysis only —
nothing is executed) and prints any query whose output schema contains
a non-scalar column.

Usage: python tools/audit_schemas.py [query_name ...]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import types as T

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("audit_schemas")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    only = set(sys.argv[1:])
    bad = {}
    errs = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            cols = [
                f"{f.name}: {f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType, NON_SCALAR)
            ]
            if cols:
                bad[name] = cols
        except Exception as e:  # noqa: BLE001 - audit must not stop
            errs[name] = f"{type(e).__name__}: {e}"
    for name, cols in sorted(bad.items()):
        print(f"NON-SCALAR {name}: {'; '.join(cols)}")
    for name, msg in sorted(errs.items()):
        print(f"ERROR {name}: {msg[:200]}")
    print(f"checked={len(qs) if not only else len(only)} "
          f"non_scalar={len(bad)} errors={len(errs)}")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
