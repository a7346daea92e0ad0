"""Model inference compiled to Catalyst expressions: score a trained
decision-tree / GBDT ensemble over feature columns as pure nested
CASE WHEN — zero Python, zero UDFs, whole-stage-codegen, and (because
the compiled form is plain SQL) bit-reproducible in any engine.

This is the production shape for applying a quality/toxicity GBDT to
a 100 TB corpus: the model is tiny and frozen, so burning it into the
plan beats any scoring service — the filter runs at scan speed and
Catalyst can reorder it with other predicates.

Tree format (plain dicts, depth-bounded by the trainer):
    {"feature": "uniq", "threshold": 0.5,
     "left": -1.0,                      # leaf: raw score contribution
     "right": {"feature": "n", ...}}    # or a subtree
Missing (NULL) feature values fall to the RIGHT branch — the common
GBDT default-direction convention; the compiled CASE WHEN's ELSE arm
gives the identical semantics in SQL oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tree_score_expr(tree, feats: dict[str, Column]) -> Column:
    """Compile one tree (or a bare leaf value) to a Column."""
    if not isinstance(tree, dict):
        return F.lit(float(tree))
    f = feats[tree["feature"]]
    return F.when(
        f < F.lit(float(tree["threshold"])),
        tree_score_expr(tree["left"], feats),
    ).otherwise(tree_score_expr(tree["right"], feats))


def tree_sql(tree, feats: dict[str, str]) -> str:
    """The SAME compilation targeting SQL text — for oracles and for
    engines that take the model as a string."""
    if not isinstance(tree, dict):
        return repr(float(tree))
    f = feats[tree["feature"]]
    thr = float(tree["threshold"])
    return (
        f"CASE WHEN {f} < {thr!r} THEN {tree_sql(tree['left'], feats)} "
        f"ELSE {tree_sql(tree['right'], feats)} END"
    )


def tree_ensemble_score(
    df: DataFrame,
    id_col: str,
    feats: dict[str, Column],
    trees: list,
    link: str = "sigmoid",
) -> DataFrame:
    """Score ``trees`` (summed raw contributions, then ``link``) over
    feature expressions. Output: (id, score rounded to 4, label =
    score >= 0.5). Scale: a pure map — one scan, no shuffle, no
    Python; the whole ensemble is a single projection."""
    raw = None
    for t in trees:
        e = tree_score_expr(t, feats)
        raw = e if raw is None else raw + e
    if link == "sigmoid":
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
    elif link == "identity":
        score = raw
    else:
        raise ValueError(f"unknown link {link!r}")
    return df.select(
        F.col(id_col),
        F.round(score, 4).alias("score"),
        (score >= 0.5).alias("label"),
    )


def ensemble_sql(trees: list, feats: dict[str, str], link: str = "sigmoid") -> str:
    """SQL expression for the summed, linked ensemble score."""
    raw = " + ".join(f"({tree_sql(t, feats)})" for t in trees)
    if link == "sigmoid":
        return f"(1.0 / (1.0 + exp(-({raw}))))"
    if link == "identity":
        return f"({raw})"
    raise ValueError(f"unknown link {link!r}")


def _self_check() -> None:  # pragma: no cover - documentation aid
    assert math.isclose(1.0 / (1.0 + math.exp(-0.0)), 0.5)
