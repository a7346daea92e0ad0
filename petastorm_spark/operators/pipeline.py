"""End-to-end corpus curation pipeline: the composition a production
pre-training data run executes as one job — exact dedup, quality
floor, per-source contribution cap, PII scrub — plus a per-stage
attrition report. Each step is one of this package's oracle-checked
operators; the pipeline only chains their (lazy) DataFrames, so
Catalyst sees a single plan per output and nothing materializes until
the caller acts.

The reference engine has no curation surface at all (it reads/writes
tensors); this is the beyond-parity layer SURVEY §7 Phase 6 calls for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petastorm_spark.operators.text import quality_score, scrub_pii


def curate_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    quality_floor: float = 0.8,
    strata_col: str | None = None,
    max_per_stratum: int | None = None,
    seed: int = 0,
    near_dedup: bool = False,
    near_dup_threshold: float = 0.8,
    quality_frac: float | None = None,
    excise_spans: bool = False,
    excise_k: int = 4,
    excise_min_count: int = 5,
    classifier_floor: float | None = None,
    classifier_features: int = 1024,
    classifier_weights: dict[int, float] | None = None,
    classifier_seed: int = 0,
    lm_floor: float | None = None,
    lm_model_df: DataFrame | None = None,
    lm_alpha: float = 0.4,
    k_anon_cols: Sequence[str] | None = None,
    k_anon_k: int = 5,
    l_div_sensitive: str | None = None,
    l_div_l: int = 3,
    t_close_sensitive: str | None = None,
    t_close_t: float = 0.2,
) -> dict[str, DataFrame]:
    """Chain the standard curation passes and return every intermediate
    stage (lazy) keyed by name, in order:

    - ``input``  — as given;
    - ``dedup``  — exact dedup, lowest id per md5(text) survives;
    - ``near_dedup`` (opt-in) — MinHash-LSH near-dup pairs >=
      ``near_dup_threshold`` Jaccard clustered via connected
      components; only each cluster's minimum id survives (stage key
      absent when ``near_dedup=False``, keeping the default report
      shape);
    - ``excised`` (opt-in) — corpus-frequent ``excise_k``-gram spans
      (>= ``excise_min_count`` occurrences) removed from every
      surviving text (:func:`~petastorm_spark.operators.dedup.
      excise_dup_spans`); runs after dedup so exact copies don't
      inflate span counts (key absent when ``excise_spans=False``);
    - ``quality`` — composite quality (floored to 1e-4 for
      cross-engine determinism) >= ``quality_floor``; OR, when
      ``quality_frac`` is set and ``strata_col`` given, the adaptive
      per-source rank floor (:func:`~petastorm_spark.operators.
      sampling_extra.keep_top_frac`) keeping the top fraction of each
      source instead of one global threshold;
    - ``classified`` (opt-in) — model-based quality gate: hash-feature
      linear classifier score (:func:`~petastorm_spark.operators.text.
      linear_classifier_score`, trained weights via
      ``classifier_weights``) >= ``classifier_floor``; a left-semi
      join on the scored ids so the text column is never widened (key
      absent when ``classifier_floor`` is None);
    - ``lm`` (opt-in) — language-model gate, the CCNet recipe's
      perplexity filter as this engine's count-based twin: stupid-
      backoff bigram ``avg_logprob``
      (:func:`~petastorm_spark.operators.text.bigram_lm_score`)
      against ``lm_model_df`` (a frozen reference corpus — e.g. a
      trusted source; defaults to the surviving docs themselves) must
      be >= ``lm_floor``. Left-semi on the scored ids; docs with < 2
      tokens have no bigram score and are dropped by the gate (key
      absent when ``lm_floor`` is None);
    - ``capped`` — at most ``max_per_stratum`` rows per
      ``strata_col`` value, key-stable md5 order (stage skipped —
      aliased to the previous stage — when either arg is None);
    - ``k_anon`` (opt-in) — k-anonymity suppression over the
      ``k_anon_cols`` quasi-identifiers (:func:`~petastorm_spark.
      operators.privacy.suppress_small_classes`): rows whose QI class
      has fewer than ``k_anon_k`` members are dropped. Runs LAST among
      the filters — every earlier stage shrinks classes, and only the
      final class sizes decide re-identification risk (key absent when
      ``k_anon_cols`` is None);
    - ``l_div`` (opt-in) — distinct l-diversity suppression over the
      SAME QI columns (:func:`~petastorm_spark.operators.privacy.
      suppress_low_diversity`): classes carrying fewer than
      ``l_div_l`` distinct ``l_div_sensitive`` values are dropped —
      the attribute-disclosure gate after the linkage gate (key absent
      when ``l_div_sensitive`` is None; requires ``k_anon_cols``);
    - ``t_close`` (opt-in) — t-closeness suppression over the SAME QI
      columns (:func:`~petastorm_spark.operators.privacy.
      suppress_low_closeness`): classes whose ``t_close_sensitive``
      DISTRIBUTION drifts more than ``t_close_t`` (ordered EMD) from
      the corpus's are dropped — the skewness-attack gate above
      l-diversity, completing the suppression ladder (key absent when
      ``t_close_sensitive`` is None; requires ``k_anon_cols``);
    - ``output`` — PII scrubbed in place.

    The near-dedup stage EXECUTES when built (connected components is
    an iterative algorithm — it cannot stay a single lazy plan); the
    other stages stay lazy.

    Scale: dedup is one digest-keyed semi-join (the winners aggregate
    is partial — only (digest, min id) shuffles, never text); quality
    is a pure map filter; the cap is the two-phase top-k of
    :func:`~petastorm_spark.operators.sampling_extra.cap_per_group`;
    the scrub is a pure map. Stages share lineage — persist an
    intermediate before fanning out if a caller reads several stages.
    """
    from petastorm_spark.operators.sampling_extra import cap_per_group

    stages: dict[str, DataFrame] = {"input": df}

    winners = (
        df.select(F.md5(F.col(text_col)).alias("_dg"), F.col(id_col))
        .groupBy("_dg")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    stages["dedup"] = df.join(winners, id_col, "left_semi")

    deduped = stages["dedup"]
    if near_dedup:
        from petastorm_spark.operators.dedup import (
            canonicalize,
            connected_components,
            near_dup_pairs,
        )

        pairs = near_dup_pairs(
            deduped, text_col, id_col, threshold=near_dup_threshold
        )
        clusters = connected_components(pairs)
        # stage key present only when enabled, so curation_report's
        # (stage_idx, stage) contract is unchanged for the default path
        deduped = stages["near_dedup"] = canonicalize(deduped, id_col, clusters)

    if excise_spans:
        from petastorm_spark.operators.dedup import excise_dup_spans

        cleaned = excise_dup_spans(
            deduped, text_col, id_col, k=excise_k, min_count=excise_min_count
        )
        keep = [c for c in deduped.columns if c != text_col]
        deduped = stages["excised"] = (
            deduped.select(*keep)
            .join(
                cleaned.select(
                    F.col(id_col), F.col("cleaned_text").alias(text_col)
                ),
                id_col,
            )
        )

    q4 = F.floor(quality_score(text_col) * 10000) / 10000
    if quality_frac is not None and strata_col is not None:
        from petastorm_spark.operators.sampling_extra import keep_top_frac

        stages["quality"] = keep_top_frac(
            deduped.withColumn("_q4", q4), strata_col, "_q4", id_col, quality_frac
        ).drop("_q4")
    else:
        stages["quality"] = deduped.where(q4 >= quality_floor)

    if classifier_floor is not None:
        from petastorm_spark.operators.text import linear_classifier_score

        # NOT the pipeline sampling seed: the classifier seed is part
        # of the MODEL identity (it picks the feature-hash space a
        # trained weight vector was fit against) and must not drift
        # when a caller reshuffles sampling
        scored = linear_classifier_score(
            stages["quality"],
            text_col,
            id_col,
            n_features=classifier_features,
            weights=classifier_weights,
            seed=classifier_seed,
        )
        keep_ids = scored.where(F.col("score") >= classifier_floor).select(id_col)
        stages["classified"] = stages["quality"].join(keep_ids, id_col, "left_semi")
        pre_cap = stages["classified"]
    else:
        pre_cap = stages["quality"]

    if lm_floor is not None:
        from petastorm_spark.operators.text import bigram_lm_score

        scored = bigram_lm_score(
            pre_cap,
            text_col,
            id_col,
            model_df=lm_model_df if lm_model_df is not None else pre_cap,
            alpha=lm_alpha,
        )
        keep_ids = scored.where(
            F.col("avg_logprob") >= lm_floor
        ).select(id_col)
        pre_cap = stages["lm"] = pre_cap.join(keep_ids, id_col, "left_semi")

    if strata_col is not None and max_per_stratum is not None:
        stages["capped"] = cap_per_group(
            pre_cap, strata_col, id_col, max_per_stratum, seed
        )
    else:
        stages["capped"] = pre_cap

    pre_out = stages["capped"]
    if k_anon_cols is not None:
        from petastorm_spark.operators.privacy import suppress_small_classes

        pre_out = stages["k_anon"] = suppress_small_classes(
            pre_out, list(k_anon_cols), k_anon_k
        )
    if l_div_sensitive is not None:
        if k_anon_cols is None:
            raise ValueError(
                "l_div_sensitive needs k_anon_cols as the QI columns"
            )
        from petastorm_spark.operators.privacy import suppress_low_diversity

        pre_out = stages["l_div"] = suppress_low_diversity(
            pre_out, list(k_anon_cols), l_div_sensitive, l_div_l
        )
    if t_close_sensitive is not None:
        if k_anon_cols is None:
            raise ValueError(
                "t_close_sensitive needs k_anon_cols as the QI columns"
            )
        from petastorm_spark.operators.privacy import suppress_low_closeness

        pre_out = stages["t_close"] = suppress_low_closeness(
            pre_out, list(k_anon_cols), t_close_sensitive, t_close_t
        )

    stages["output"] = pre_out.withColumn(text_col, scrub_pii(text_col))
    return stages


def curation_report(stages: dict[str, DataFrame]) -> DataFrame:
    """Per-stage attrition: ``(stage_idx, stage, n_rows)`` — what every
    curation run logs first. One aggregate per stage unioned into a
    single plan; each count is a partial aggregation, so the report
    costs one scan per stage (persist upstream stages to pay less)."""
    parts = []
    for i, (name, sdf) in enumerate(stages.items()):
        parts.append(
            sdf.agg(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
