"""Local mimic of the driver's t2 gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and (order-insensitive) values.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        # numpy arrays from spark/duckdb list columns
        try:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray) else v
            )
        except Exception:
            pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from petastorm_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("correctness_check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    wanted = sys.argv[1:] or list(qs)
    unknown = [w for w in wanted if w not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(qs)}")
        sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_weak = 0
    for name in wanted:
        fn = qs[name]
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle, rows-only check)")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        else:
            # dtype drift: int-vs-float is a hard FAIL — the driver
            # hashes values, and 5 vs 5.0 hash differently (proven by
            # pack_sequences in round 4: HUGEINT->float64 on the
            # oracle side hash-mismatched despite equal values).
            # Same-kind width drift (int32 vs int64) stays a warning.
            for c in sorted(sdf.columns):
                st, ot = str(sdf[c].dtype), str(odf[c].dtype)
                if st != ot:
                    s_int = st.startswith(("int", "uint"))
                    o_int = ot.startswith(("int", "uint"))
                    s_f = st.startswith("float")
                    o_f = ot.startswith("float")
                    if (s_int and o_f) or (s_f and o_int):
                        problems.append(
                            f"dtype kind mismatch {c}: spark={st} oracle={ot}"
                        )
                    else:
                        print(f"  DTYPE {name}.{c}: spark={st} oracle={ot}")
        if len(sdf) != len(odf):
            problems.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        if not problems:
            a, b = canon(sdf), canon(odf)
            bad = 0
            first = None
            for i in range(len(a)):
                for c in a.columns:
                    if not values_equal(a.at[i, c], b.at[i, c]):
                        bad += 1
                        if first is None:
                            first = (i, c, a.at[i, c], b.at[i, c])
            if bad:
                problems.append(f"{bad} value mismatches; first={first}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            # a 0-row agreement can hide a shared wrong literal (both
            # engines agreeing on the empty set proves nothing)
            flag = " (WARN: empty result — vacuous agreement?)" if len(sdf) == 0 else ""
            print(f"PASS {name} rows={len(sdf)}{flag}")
            n_pass += 1

    print(f"== {n_pass} pass, {n_weak} weak, {n_fail} fail ==")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
