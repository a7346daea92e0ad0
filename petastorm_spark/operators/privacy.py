"""Privacy / re-identification risk operators — the compliance leg of
the curation pipeline (PII *scrubbing* lives in operators/text.py;
this module measures and enforces what scrubbing can't: rows whose
QUASI-identifier combination is rare enough to re-identify someone
even with direct identifiers removed).

k-anonymity (Sweeney 2002, "k-Anonymity: a model for protecting
privacy"): a release is k-anonymous when every combination of
quasi-identifier values is shared by at least k rows. The report is
one groupBy over the QI columns; enforcement (suppression) is a
left-semi join against the safe classes — both partial-aggregate
before their single exchange, so they scale like any count.

Reference: the reference engine has no privacy surface (SURVEY §2 —
it moves tensors); this is beyond-parity curation tooling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One row per quasi-identifier equivalence class:
    ``(*qi_cols, class_size, at_risk)`` with ``at_risk = 1`` when the
    class has fewer than ``k`` members (the rows a linkage attack can
    single out). Scale: one partially-aggregated groupBy on the QI
    key; output is bounded by the QI domain product, not N."""
    return (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", (F.col("class_size") < k).cast("int"))
    )


def k_anonymity_summary(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """The scalar rollup a release gate reads: (n_rows, n_classes,
    n_at_risk_classes, n_rows_at_risk, min_class_size, k). A dataset
    is k-anonymous over ``qi_cols`` iff ``n_rows_at_risk == 0``
    (equivalently ``min_class_size >= k``)."""
    rep = k_anonymity_report(df, qi_cols, k)
    # coalesce the sums so an EMPTY release (trivially k-anonymous)
    # reads n_rows_at_risk == 0, not NULL — the gate condition must
    # pass, not evaluate falsy-by-accident; min_class_size stays NULL
    # (there is no class to have a size)
    return rep.agg(
        F.coalesce(F.sum("class_size"), F.lit(0))
        .cast("bigint")
        .alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.coalesce(F.sum("at_risk"), F.lit(0))
        .cast("bigint")
        .alias("n_at_risk_classes"),
        F.coalesce(F.sum(F.col("class_size") * F.col("at_risk")), F.lit(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.lit(k).cast("int").alias("k"),
    )


def suppress_small_classes(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Enforce k-anonymity by SUPPRESSION: drop every row whose QI
    class has fewer than ``k`` members (the standard alternative to
    generalizing the QI values — see the bucket columns callers
    usually pre-compute, e.g. ``floor(acctbal / 1000)``). Left-semi
    join against the safe classes, null-safe on the QI key so NULL
    QI values form their own class exactly as groupBy counted them."""
    safe = (
        k_anonymity_report(df, qi_cols, k)
        .where(F.col("at_risk") == 0)
        .select(*qi_cols)
    )
    cond = None
    for c in qi_cols:
        eq = df[c].eqNullSafe(safe[c])
        cond = eq if cond is None else (cond & eq)
    return df.join(safe, cond, "left_semi")
