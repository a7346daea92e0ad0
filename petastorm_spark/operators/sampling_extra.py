"""Stratified sampling and BM25 ranked retrieval — corpus-curation
operators a training-data pipeline needs beyond the reference's
row-group sharding/weighted-mix surface (petastorm/reader.py:90-150
exposes only uniform shard/shuffle; no per-stratum rates, no ranking).

Both are pure built-in-function plans: the sampling filter is a
per-row md5 fraction (key-stable, engine-reproducible — the DuckDB
oracles recompute it bit-for-bit), and BM25 is two corpus aggregates
broadcast into a per-doc map — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petastorm_spark.operators.text import tokens
from petastorm_spark.predicates import md5_fraction


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    md5 fraction (keyed on ``seed|key``) falls below its stratum's
    rate — the domain-mixing step of corpus curation (e.g. keep 100%
    of books, 10% of crawl).

    Key-stable: the same key keeps/drops identically across runs,
    partitionings, and engines (unlike ``df.sampleBy``, whose
    per-partition RNG changes with the split layout). Scale: a pure
    map-side filter — no shuffle, no per-stratum pass; the rate lookup
    is a literal CASE over the (small) fractions dict.
    """
    frac = md5_fraction(F.concat_ws("|", F.lit(str(seed)), F.col(key_col)))
    rate = F.lit(float(default_fraction))
    for value, p in fractions.items():
        rate = F.when(F.col(strata_col) == value, F.lit(float(p))).otherwise(rate)
    return df.where(frac < rate)


def sample_temperature(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-flattened source mixing: stratum ``s`` with ``n_s``
    rows is kept at rate ``(n_s / n_min)^(alpha-1)`` (rounded to 6
    decimals for cross-engine float parity), so sampled sizes are
    proportional to ``n_s^alpha`` — ``alpha=1`` keeps the natural
    distribution, ``alpha=0`` flattens to uniform, the multilingual /
    multi-source re-balancing standard. The smallest stratum is kept
    in full; membership is the same key-stable md5 fraction as
    :func:`sample_stratified`.

    Scale: stratum counts are ONE partially-aggregated tiny result,
    broadcast back onto the corpus — the data itself never shuffles;
    the keep decision is a map-side filter.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        strata_col,
        F.round(
            F.pow(F.col("_n") / F.col("_nmin"), F.lit(alpha - 1.0)), 6
        ).alias("_rate"),
    )
    frac = md5_fraction(F.concat_ws("|", F.lit(str(seed)), F.col(key_col)))
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(frac < F.col("_rate"))
        .drop("_rate")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log-likelihood of
    each document under the corpus's OWN unigram distribution —
    ``(id, n_tokens, logprob)``, low scores flag gibberish/rare-token
    spam the way an external LM filter would, with no model file.

    Scale: explode -> partially-aggregated vocab count (combiner
    collapses repeats map-side), vocab broadcast back onto the token
    stream (vocabularies are tiny next to the corpus; swap the
    broadcast for a shuffle join — or truncate to top-K with a
    smoothing floor — if a deployment's vocab outgrows executors),
    then one per-doc aggregation. No Python UDFs.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    )
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    total = vocab.agg(F.sum("_c").alias("_total"))
    vocab = vocab.crossJoin(F.broadcast(total))
    return (
        toks.join(F.broadcast(vocab), "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("_c") / F.col("_total"))), 4
            ).alias("logprob"),
        )
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms: ``(id_col, score)`` for docs matching >= 1 term.

    score = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Scale: corpus stats (N, avgdl, per-term document frequencies) are
    ONE partial aggregate collapsed to a single row and broadcast back
    via crossJoin — the corpus is scanned twice (stats, then scoring),
    both scans pure map + partial agg, nothing shuffled by term. Term
    count is bounded by the query, so per-row work is O(|query| * dl).
    """
    toks = df.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))

    def _tf(term: str):
        return F.size(F.filter("_toks", lambda x: x == F.lit(term)))

    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((_tf(t) > 0).cast("bigint")).alias(f"_df_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    scored = toks.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        tf = _tf(t).cast("double")
        idf = F.log(
            1.0
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        score = score + idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
    return (
        scored.withColumn("_score", score)
        .where(F.col("_score") > 0)
        .select(
            F.col(id_col),
            (F.floor(F.col("_score") * 10000) / 10000).alias("score"),
        )
    )


def bm25_top_k(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 retrieval: rank all matching docs, keep the best k
    (ties broken by id for determinism). Scale: partition-local top-k
    via the same sort-merge pattern as ANN exact top-k — the global
    sort only ever sees <= k rows per partition."""
    scored = bm25_scores(df, text_col, id_col, query_terms, k1, b)
    return (
        scored.orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k_const: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked
    retrieval lists: ``rrf = sum over systems of 1 / (k_const +
    rank)``, the standard score-free way to combine lexical (BM25)
    and vector (ANN) retrieval — no score normalization across
    incomparable scales, just ranks. Output: (id, rrf_score round 6,
    rank), top ``k``, ties by id.

    Scale: each input is already a top-n list (retrieval output,
    bounded), so the union + groupBy touches system-count x n rows;
    determinism note — double addition is commutative, so 2-system
    fusion is bit-stable across engines regardless of union order;
    beyond 2 systems the sum is order-sensitive in the last bit,
    absorbed by the 1e-6 rounding."""
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col(rank_col).cast("double"))
             ).alias("_s"),
        )
        for df in ranked
    ]
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    fused = scored.groupBy(id_col).agg(
        F.sum("_s").alias("_raw"), F.count(F.lit(1)).alias("n_systems")
    )
    from pyspark.sql import Window

    top = fused.orderBy(F.desc("_raw"), F.col(id_col)).limit(k)
    # rank window runs over the <= k surviving rows only — benign
    w = Window.orderBy(F.desc("_raw"), F.col(id_col))
    return top.select(
        F.col(id_col),
        F.round("_raw", 6).alias("rrf_score"),
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("n_systems"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_per_group: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``max_per_group`` rows
    per ``group_col`` value, chosen by md5-fraction order (keyed on
    ``seed|key``) — the "no source may exceed K documents" mix control
    of corpus curation. Key-stable like :func:`sample_stratified`:
    membership never depends on partitioning or execution order.

    Scale: two-phase top-k (the ANN/topk_per_group pattern) — a
    partition-local rank keyed on (partition, group) first discards
    everything beyond K within each task, so the single per-group
    shuffle carries at most ``K * num_partitions`` rows per group
    instead of the whole group; a hot group (one source dominating the
    corpus) costs bounded memory in every task. Output is the original
    rows unchanged.
    """
    from pyspark.sql import Window

    if max_per_group < 1:
        raise ValueError(f"max_per_group must be >= 1, got {max_per_group}")
    frac = md5_fraction(
        F.concat_ws("|", F.lit(str(seed)), F.col(key_col))
    )
    local = Window.partitionBy("_pid", group_col).orderBy(
        F.col("_frac").asc(), F.col(key_col).asc()
    )
    final = Window.partitionBy(group_col).orderBy(
        F.col("_frac").asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_frac", frac)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local))
        .where(F.col("_lr") <= max_per_group)
        .withColumn("_r", F.row_number().over(final))
        .where(F.col("_r") <= max_per_group)
        .drop("_frac", "_pid", "_lr", "_r")
    )


def keep_top_frac(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tie_col: str,
    frac: float,
) -> DataFrame:
    """Per-group rank floor: keep the top ``ceil(frac * n)`` rows of
    each group ordered by (``score_col`` desc, ``tie_col`` asc) — the
    "drop the worst q% of every source by quality score" curation
    step, with the threshold adapting to each source's own score
    distribution instead of one global cutoff.

    Rank-based deliberately, not percentile-threshold: an interpolated
    percentile (Spark ``percentile`` / DuckDB ``quantile_cont``) can
    disagree across engines in the last ulp and flip boundary rows; a
    rank cut over a deterministic (score, tie) order never does. For
    cross-engine stability the caller should pass an engine-exact
    score (e.g. floor-scaled to 1e-4 like text.quality_score queries).

    Scale: ``rank.grouped_rank`` — range-partitioned on (group, score,
    tie) so a pathological group (one source dominating the corpus)
    spreads across MANY tasks instead of bounding one; rank and group
    count ride the same tiny per-(partition, group) offset broadcast.
    (Until round 6 this was a Window.partitionBy(group) — correct, but
    one task per group.)
    """
    from petastorm_spark.operators.rank import grouped_rank

    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    ranked = grouped_rank(
        df,
        [group_col],
        [F.col(score_col).desc(), F.col(tie_col).asc()],
        rank_col="_rn",
        count_col="_n",
    )
    return ranked.where(
        F.col("_rn") <= F.ceil(F.lit(float(frac)) * F.col("_n"))
    ).drop("_rn", "_n")


def sample_weighted(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    group_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ES): each row draws u = md5-fraction(seed|key) and ranks by
    u^(1/w); the top ``k`` (per ``group_col`` when given, else
    global) are an exact weighted sample — "sample 10k docs per
    source, proportional to quality weight" with deterministic,
    key-stable membership (reruns, repartitions, and engines agree;
    ``df.sample`` can't do weights, RAND() can't do stability).
    Rows with non-positive weight are dropped.

    Scale: the same two-phase top-k as :func:`cap_per_group` — a
    partition-local rank discards beyond-k rows map-side, so the
    (single) group shuffle carries at most k * num_partitions rows
    per group; hot groups cost bounded memory per task.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = md5_fraction(F.concat_ws("|", F.lit(str(seed)), F.col(key_col)))
    rank_key = F.pow(u, 1.0 / F.col(weight_col))
    grp = [group_col] if group_col is not None else []
    local = Window.partitionBy("_pid", *grp).orderBy(
        F.col("_rk").desc(), F.col(key_col).asc()
    )
    final = Window.partitionBy(*grp) if grp else Window.partitionBy()
    final = final.orderBy(F.col("_rk").desc(), F.col(key_col).asc())
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_rk", rank_key)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local))
        .where(F.col("_lr") <= k)
        .withColumn("_r", F.row_number().over(final))
        .where(F.col("_r") <= k)
        .drop("_rk", "_pid", "_lr", "_r")
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Second-order perplexity proxy: mean Laplace-smoothed bigram
    transition log-likelihood per document,
    ``ln((c(w1,w2) + 1) / (c(w1) + V))`` averaged over the doc's
    transitions — catches scrambled/word-salad text whose unigram
    distribution looks normal (every token common, every TRANSITION
    rare). Output: (id, n_bigrams, logprob), docs with < 2 tokens
    dropped.

    Scale: one corpus pass counts unigrams (vocab-sized) and one
    counts bigrams (bigram-vocab-sized, partially aggregated); both
    tables broadcast back onto the doc's transition stream (swap the
    bigram broadcast for a shuffle join when a deployment's bigram
    table outgrows executors), then one per-doc aggregation. The
    explode lives inline with the projection that builds the bigram
    array (generator-placement rule).
    """
    base = df.withColumn("_toks", tokens(text_col)).where(F.size("_toks") >= 2)
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 2),
            lambda i: F.struct(
                F.element_at("_toks", (i + 1).cast("int")).alias("w1"),
                F.element_at("_toks", (i + 2).cast("int")).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    occ = base.select(F.col(id_col), F.explode(bigrams).alias("_b")).select(
        F.col(id_col), F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2")
    )
    uni = (
        base.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("_cu"))
    )
    v = uni.agg(F.count(F.lit(1)).alias("_v"))
    uni = uni.crossJoin(F.broadcast(v))
    bi = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    lp = F.log((F.col("_cb") + 1) / (F.col("_cu") + F.col("_v")))
    return (
        occ.join(F.broadcast(bi), ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (F.floor(F.avg(lp) * 10000) / 10000).alias("logprob"),
        )
    )


def negative_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    seed: int = 0,
    n_buckets: int | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    row gets up to ``k`` pseudo-random partners, drawn by hashing the
    id into one of ``n_buckets`` buckets per draw (seeded md5, so the
    pairing is key-stable across runs/partitionings/engines — the
    random-negative baseline that hard-negative mining is measured
    against). Partner = the bucket's minimum other id (maximum when
    this row IS the minimum); singleton buckets yield no pair for
    that draw. Output: (id_a, draw, id_b).

    ``n_buckets`` defaults to ~|corpus|/2 (one count job) so buckets
    average two members and most draws pair. Scale: ONE shuffle on
    the (draw, bucket) key — the k draws explode map-side inline with
    the projection; the min/max resolve in a single window pass over
    bucket-sized groups.
    """
    from pyspark.sql import Window

    from petastorm_spark.operators.dedup import hash60

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets is None:
        n_buckets = max(1, df.count() // 2)
    draws = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("draw"),
                    (
                        hash60(
                            F.concat_ws(
                                "|",
                                F.lit(str(seed)),
                                F.lit(str(j)),
                                F.col(id_col).cast("string"),
                            )
                        )
                        % n_buckets
                    ).alias("bucket"),
                )
                for j in range(k)
            ]
        )
    ).alias("_d")
    occ = df.select(F.col(id_col).alias("id_a"), draws).select(
        "id_a", F.col("_d.draw").alias("draw"), F.col("_d.bucket").alias("bucket")
    )
    w = Window.partitionBy("draw", "bucket")
    out = (
        occ.withColumn("_mn", F.min("id_a").over(w))
        .withColumn("_mx", F.max("id_a").over(w))
        .withColumn(
            "id_b",
            F.when(F.col("_mn") != F.col("id_a"), F.col("_mn")).otherwise(
                F.col("_mx")
            ),
        )
        .where(F.col("id_b") != F.col("id_a"))
        .select("id_a", "draw", "id_b")
    )
    return out


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    strata_col: str,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank
    every document within its stratum (usually language) by LM-proxy
    quality (:func:`unigram_logprob` — higher = more natural) and cut
    each stratum into equal thirds: ``head`` (best), ``middle``,
    ``tail`` (worst). Downstream mixes sample per bucket (keep all of
    head, some of middle, little of tail) instead of one hard floor.

    Rank-based deliberately (same argument as ``keep_top_frac``): a
    percentile THRESHOLD can disagree across engines in the last ulp;
    a row_number cut over (logprob desc, id asc) never does — so even
    the bucket labels are engine-exact. Output:
    ``(id, stratum, logprob, bucket)``.

    Scale: the logprob is the unigram_logprob plan (explode + vocab
    broadcast + per-doc agg); the per-stratum rank comes from
    ``rank.grouped_rank`` — a ``Window.partitionBy(lang)`` would cap
    parallelism at the number of LANGUAGES (~5 tasks for a whole
    corpus, measured 4.8x degradation at the 6M-doc tier); the
    grouped-rank plan range-partitions on (lang, logprob, id) so one
    language spreads over many tasks, with the per-(partition, lang)
    offset table (tiny) broadcast back.
    """
    from petastorm_spark.operators.rank import grouped_rank

    lp = unigram_logprob(df, text_col, id_col)
    joined = df.select(F.col(id_col), F.col(strata_col)).join(lp, id_col)
    ranked = grouped_rank(
        joined,
        [strata_col],
        [F.col("logprob").desc(), F.col(id_col).asc()],
        rank_col="_rn",
        count_col="_gn",
    )
    rn, n = F.col("_rn"), F.col("_gn")
    bucket = (
        F.when(rn <= F.ceil(n / 3.0), F.lit("head"))
        .when(rn <= F.ceil(2 * n / 3.0), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        F.col(id_col), F.col(strata_col), F.col("logprob"), bucket.alias("bucket")
    )


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target,
    n_buckets: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    hashed-ngram flavor): score every document by how much more likely
    its tokens are under a TARGET slice's distribution than under the
    raw corpus's, with token identity coarsened to ``hash(token) %
    n_buckets`` feature buckets — the model-free "does this crawl doc
    look like my curated set" importance weight. ``is_target`` is a
    boolean Column selecting the target slice (e.g. curated sources).

    weight(doc) = mean over token occurrences of
    ``ln(p_target(b) / p_raw(b))`` with +0.5 additive smoothing over
    the bucket table, rounded to 1e-4 (cross-engine float parity, same
    convention as :func:`unigram_logprob`). Positive = target-like.

    Scale: ONE token explode feeds both bucket tables (raw counts and
    conditional target counts in the same partially-aggregated pass);
    the <= ``n_buckets``-row ratio table broadcasts back onto the
    token stream, then one per-doc aggregation. The shuffle key is the
    integer bucket, never the token string. No Python UDFs.
    """
    ratio = dsir_bucket_ratios(df, text_col, is_target, n_buckets, seed)
    occ = _dsir_occurrences(df, text_col, id_col, n_buckets, seed)
    return (
        occ.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("_lr"), 4).alias("dsir_logweight"),
        )
    )


def _dsir_occurrences(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, seed: int
) -> DataFrame:
    from petastorm_spark.operators.dedup import hash60

    return df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).select(
        F.col(id_col), (hash60("_tok", seed=seed) % n_buckets).alias("_b")
    )


def dsir_bucket_ratios(
    df: DataFrame,
    text_col: str,
    is_target,
    n_buckets: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """The reusable half of :func:`dsir_weights`: the per-bucket
    smoothed log-likelihood-ratio table ``(_b, _lr)`` (<= ``n_buckets``
    rows). Build it ONCE offline from the corpus + target slice, then
    broadcast it wherever docs need scoring — the batch scorer here
    and the streaming scorer (``streaming.feed.dsir_score_stream``)
    share it."""
    from petastorm_spark.operators.dedup import hash60

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    occ = df.select(
        is_target.alias("_tgt"), F.explode(tokens(text_col)).alias("_tok")
    ).select("_tgt", (hash60("_tok", seed=seed) % n_buckets).alias("_b"))
    counts = occ.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_cr"),
        F.sum(F.col("_tgt").cast("bigint")).alias("_ct"),
    )
    totals = counts.agg(
        F.sum("_cr").alias("_nr"), F.sum("_ct").alias("_nt")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "_b",
        F.log(
            ((F.col("_ct") + 0.5) / (F.col("_nt") + 0.5 * n_buckets))
            / ((F.col("_cr") + 0.5) / (F.col("_nr") + 0.5 * n_buckets))
        ).alias("_lr"),
    )


def approx_quantiles_sampled(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    probs: list[float],
    k: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Approximate per-group quantiles via a DETERMINISTIC sample:
    md5-order reservoir of ``k`` rows per group (:func:`cap_per_group`
    — key-stable membership), then exact interpolated quantiles of the
    sample. The engine-portable answer to "exact percentiles sort the
    whole group, t-digest answers differ per engine": error follows
    sampling theory (~1/sqrt(k) quantile deviation), while the VALUE
    is bit-reproducible across runs, partitionings, and engines — so
    even this approximate operator passes a hash-exact oracle.
    Mergeable in the reservoir sense: union two groups' samples and
    re-cap to k for a combined estimate.

    Output: (group, p_<prob> ... ) floor-scaled to 1e-4. Scale: the
    two-phase cap bounds every task at k rows per group; the quantile
    sort is over k rows, never the group.
    """
    samp = cap_per_group(df, group_col, key_col, k, seed)
    aggs = [
        (
            F.floor(
                F.percentile(F.col(value_col), F.lit(float(p))) * 10000
            )
            / 10000
        ).alias(f"p_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return samp.groupBy(group_col).agg(*aggs)


def token_budget_mix(
    df: DataFrame,
    text_col: str,
    source_col: str,
    budget_tokens: int,
    alpha: float = 0.7,
) -> DataFrame:
    """Plan a training mixture against a token budget: per source,
    measured token count, temperature-weighted target share
    (w_s ∝ C_s^alpha — alpha<1 upweights small sources, the
    multilingual-sampling standard), the target token allocation, and
    the keep fraction / epoch count that realizes it (epochs > 1 means
    the source repeats). Output: (source, n_tokens, weight,
    target_tokens, keep_frac, epochs).

    Scale: ONE partial-aggregated groupBy(source) over the corpus;
    everything after is arithmetic on the source-count table (sources
    number in the thousands at worst) with the normalizing constant a
    1-row broadcast. Feed keep_frac into sample_stratified /
    sample_temperature to execute the plan map-side."""
    from petastorm_spark.operators.text import token_count

    counts = (
        df.select(F.col(source_col).alias("source"), token_count(text_col).alias("_n"))
        .groupBy("source")
        .agg(F.sum("_n").cast("bigint").alias("n_tokens"))
    )
    tot = counts.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("_z")
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("_z")
    target = w * F.lit(float(budget_tokens))
    epochs = target / F.col("n_tokens")
    return counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.round(w, 6).alias("weight"),
        F.round(target, 2).alias("target_tokens"),
        F.round(F.least(F.lit(1.0), epochs), 6).alias("keep_frac"),
        F.round(epochs, 6).alias("epochs"),
    )


def source_mix_report(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Corpus-mix balance diagnostic per group (source/domain/lang):
    the numbers a data-mixing decision reads before setting sampling
    temperatures — doc and token mass, token share, the Shannon
    entropy TERM (sum of ent_term over rows = mix entropy in nats;
    exp of it = the effective source count), and the Gini NUMERATOR
    term ((2*rank - n - 1) * tokens as an exact integer; sum / (n *
    total_tokens) = the Gini concentration coefficient). Per-row
    terms, not cross-row double sums — the psi/mi/rbo exactness
    pattern; the Gini pieces stay exact integers until the consumer's
    one division.

    Scale: one explode-free token count per row (size of split), one
    partially-aggregated groupBy on the group key, a broadcast 1-row
    total, and one window over the GROUP-count-sized table for the
    rank — never a corpus-scale sort."""
    from pyspark.sql import Window

    from petastorm_spark.operators.text import token_count

    per = df.groupBy(F.col(group_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col).cast("bigint")).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("decimal(38,0)").alias("_tt"),
        F.count(F.lit(1)).alias("_ng"),
    )
    # explicit NULLS LAST on the tie-break: Spark ASC defaults nulls
    # FIRST while DuckDB/ANSI default them LAST — a NULL source group
    # would otherwise get a different rank (and Gini term) per engine
    # n_tokens too: a group whose docs are all NULL-text sums to a
    # NULL token mass, which Spark ASC puts FIRST and DuckDB LAST —
    # pin NULLS LAST on the primary key as well
    w = Window.orderBy(
        F.col("n_tokens").asc_nulls_last(), F.col("source").asc_nulls_last()
    )
    ranked = per.crossJoin(F.broadcast(tot)).withColumn(
        "_rank", F.row_number().over(w)
    )
    p = F.col("n_tokens").cast("double") / F.col("_tt").cast("double")
    ent = F.when(F.col("n_tokens") > 0, -(p * F.log(p))).otherwise(
        F.lit(0.0)
    )
    gini_num = (
        (F.lit(2) * F.col("_rank") - F.col("_ng") - F.lit(1)).cast(
            "decimal(38,0)"
        )
        * F.col("n_tokens").cast("decimal(38,0)")
    )
    return ranked.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(p, 6).alias("token_share"),
        F.round(ent, 6).alias("ent_term"),
        gini_num.cast("string").alias("gini_num"),
    )
