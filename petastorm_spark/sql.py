"""SQL surface: register the engine's tables/datasets as temp views so
the full catalog is reachable with ``spark.sql(...)`` — Catalyst plans
SQL and DataFrame code identically, so everything in COVERAGE.md is
available to SQL users for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register each parquet table in ``sf_dir`` as a temp view."""
    names = names or TESTDATA_TABLES
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)
    return list(names)


def register_dataset(spark: SparkSession, dataset_url: str, view_name: str) -> None:
    """Register a (petastorm-style or plain) dataset dir as a view."""
    spark.read.parquet(dataset_url).createOrReplaceTempView(view_name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)


def _zorder2_sql(bits: int = 10) -> str:
    """SQL body for the 2-column Morton interleave (``ps_zorder2``) —
    delegated to the canonical generator in operators/layout.py so the
    SQL surface, the Column factory, and the DuckDB oracles share one
    bit layout."""
    from petastorm_spark.operators.layout import zorder_value_sql

    return zorder_value_sql(["x", "y"], bits=bits)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Expose the engine's scalar curation primitives as SQL-language
    functions (``CREATE TEMPORARY FUNCTION ... RETURN <expr>``) — the
    bodies are pure Spark-SQL expressions, so SQL users get the SAME
    whole-stage-codegen JVM plans as the Column factories in
    operators/text.py and predicates.py, not a python-UDF detour.
    Returns the registered names (all ``ps_``-prefixed).

    Identity contract: every body is the SQL rendering of the
    corresponding Column factory, pinned by
    tests/test_misc_ops.py::test_sql_functions_match_column_factories.
    """
    from petastorm_spark.operators.text import (
        LANG_LEXICONS,
        PII_PATTERNS,
        STOPWORDS,
    )

    tok = "split(lower(trim(t)), '\\\\s+')"
    sw = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

    scrub = "t"
    for name, pat in sorted(PII_PATTERNS.items()):
        sql_pat = pat.replace("\\", "\\\\")
        scrub = f"regexp_replace({scrub}, '{sql_pat}', '[{name.upper()}]')"

    lang_scores = []
    for lang, lex in sorted(LANG_LEXICONS.items()):
        arr = "array(" + ", ".join(f"'{w}'" for w in lex) + ")"
        lang_scores.append(
            (lang, f"size(filter({tok}, x -> array_contains({arr}, x)))")
        )
    best = "greatest(" + ", ".join(s for _, s in lang_scores) + ")"
    lang_case = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN {s} = {best} THEN '{l}'" for l, s in lang_scores)
        + " END"
    )

    quality = f"""
        (CASE WHEN size(filter({tok}, x -> array_contains({sw}, x))) / size({tok})
                   > 0.01
               AND size(filter({tok}, x -> array_contains({sw}, x))) / size({tok})
                   < 0.6
              THEN 1.0 ELSE 0.5 END) * 0.3
        + (size(array_distinct({tok})) / size({tok})) * 0.3
        + (length(regexp_replace(lower(trim(t)), '[^a-z ]', '')) /
           length(lower(trim(t)))) * 0.2
        + (CASE WHEN size({tok}) BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.5 END) * 0.2
    """

    defs = {
        "ps_tokens": f"(t STRING) RETURNS ARRAY<STRING> RETURN {tok}",
        "ps_token_count": f"(t STRING) RETURNS INT RETURN size({tok})",
        "ps_stopword_ratio": (
            "(t STRING) RETURNS DOUBLE RETURN "
            f"size(filter({tok}, x -> array_contains({sw}, x))) / size({tok})"
        ),
        "ps_quality": f"(t STRING) RETURNS DOUBLE RETURN {quality}",
        "ps_detect_language": f"(t STRING) RETURNS STRING RETURN {lang_case}",
        "ps_fingerprint": (
            "(t STRING) RETURNS STRING RETURN "
            f"md5(concat_ws(' ', array_sort(array_distinct({tok}))))"
        ),
        "ps_scrub_pii": f"(t STRING) RETURNS STRING RETURN {scrub}",
        "ps_hash60": (
            "(s STRING) RETURNS BIGINT RETURN "
            "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
        ),
        "ps_md5_fraction": (
            "(s STRING) RETURNS DOUBLE RETURN "
            "cast(cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
            f" / {1 << 60} as double)"
        ),
        "ps_normalize_text": (
            "(t STRING) RETURNS STRING RETURN "
            "trim(regexp_replace(lower(t), '[^a-z0-9]+', ' '))"
        ),
        "ps_zorder2": (
            "(x BIGINT, y BIGINT) RETURNS BIGINT RETURN " + _zorder2_sql()
        ),
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(defs)
