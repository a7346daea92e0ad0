"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting.

All column expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen) — no Python UDFs in any hot path. Each operator
is a Column factory so it composes into any DataFrame plan and scales
as a pure map (no shuffle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lexicons. Real deployments swap in full
# lists; the operator shape (array_intersect against a literal array)
# is what matters at scale.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "on", "for"]

LANG_LEXICONS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["de", "shi", "bu", "le", "ren", "wo", "you", "ta"],
}


def tokens(text_col) -> Column:
    """Whitespace tokenization of lowercased text -> array<string>."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(text_col) -> Column:
    return F.size(tokens(text_col))


def distinct_token_count(text_col) -> Column:
    return F.size(F.array_distinct(tokens(text_col)))


def avg_token_len(text_col) -> Column:
    """Mean token length (0 for empty docs)."""
    t = tokens(text_col)
    total = F.aggregate(
        t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def stopword_ratio(text_col) -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    t = tokens(text_col)
    hits = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def uniqueness_ratio(text_col) -> Column:
    """distinct/total token ratio — low values flag boilerplate/spam."""
    t = tokens(text_col)
    return F.when(
        F.size(t) > 0, F.size(F.array_distinct(t)) / F.size(t)
    ).otherwise(F.lit(0.0))


def alpha_ratio(text_col) -> Column:
    """Fraction of characters that are a-z/space (punctuation/noise
    signal)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    low = F.lower(c)
    clean = F.regexp_replace(low, r"[^a-z ]", "")
    return F.when(F.length(low) > 0, F.length(clean) / F.length(low)).otherwise(
        F.lit(0.0)
    )


def quality_score(text_col) -> Column:
    """Composite quality in [0,1]: rewards natural stopword density,
    lexical variety, clean characters, and reasonable length."""
    sw = stopword_ratio(text_col)
    uniq = uniqueness_ratio(text_col)
    alpha = alpha_ratio(text_col)
    n = token_count(text_col)
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_ok = F.when((sw > 0.01) & (sw < 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return sw_ok * 0.3 + uniq * 0.3 + alpha * 0.2 + len_ok * 0.2


def syllable_count(text_col) -> Column:
    """Vowel-group syllable approximation (count of maximal
    [aeiouy]+ runs in the lowered text) — the standard dictionary-free
    estimator readability formulas are calibrated against. Exact
    integer per doc, so every downstream score is engine-exact."""
    return F.regexp_count(F.lower(F.trim(text_col)), F.lit("[aeiouy]+"))


def sentence_count(text_col) -> Column:
    """Terminal-punctuation sentence count, floored at 1 (a fragment
    with no [.!?] is one sentence, and the floor keeps W/S finite)."""
    return F.greatest(
        F.lit(1), F.regexp_count(text_col, F.lit("[.!?]+"))
    )


def flesch_reading_ease(text_col) -> Column:
    """Flesch reading ease (Flesch 1948): 206.835 - 1.015*(W/S) -
    84.6*(Y/W) over the exact integer word / sentence / vowel-group
    counts — the classic prose-complexity quality signal next to
    :func:`quality_score`'s ratio bundle. Identical integer inputs +
    correctly-rounded IEEE double ops make it bit-reproducible across
    engines. NULL on zero-word docs."""
    w = token_count(text_col).cast("double")
    s = sentence_count(text_col).cast("double")
    y = syllable_count(text_col).cast("double")
    return F.when(
        w > 0,
        F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w),
    )


def fk_grade_level(text_col) -> Column:
    """Flesch-Kincaid grade level (Kincaid et al. 1975):
    0.39*(W/S) + 11.8*(Y/W) - 15.59 — the same exact integer counts
    as :func:`flesch_reading_ease`, scaled to US school grades (the
    unit most curation quality floors are quoted in). NULL on
    zero-word docs."""
    w = token_count(text_col).cast("double")
    s = sentence_count(text_col).cast("double")
    y = syllable_count(text_col).cast("double")
    return F.when(
        w > 0,
        F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59),
    )


def _lexicon_hits(t: Column, lex: list[str]) -> Column:
    # NB: the lambda must take exactly one parameter — F.filter treats a
    # two-parameter lambda as (element, index), so a `lex=lex` default
    # would silently receive the index column.
    return F.size(F.filter(t, lambda x: x.isin(lex)))


def lang_scores(text_col) -> list[tuple[str, Column]]:
    """Per-language lexicon hit counts."""
    t = tokens(text_col)
    return [
        (lang, _lexicon_hits(t, lex)) for lang, lex in sorted(LANG_LEXICONS.items())
    ]


def detect_language(text_col) -> Column:
    """argmax of lexicon hit counts; ties break alphabetically; no hits
    at all -> 'und' (BCP-47 undetermined)."""
    scores = lang_scores(text_col)
    best_score = reduce(lambda a, b: F.greatest(a, b), [s for _, s in scores])
    pick = F.lit("und")
    for lang, score in reversed(scores):  # earlier langs win ties
        pick = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(
            pick
        )
    return pick


def fingerprint(text_col) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (catches shuffled/bag-of-words duplicates)."""
    t = F.array_sort(F.array_distinct(tokens(text_col)))
    return F.md5(F.concat_ws(" ", t))


# PII patterns written to the Java-regex / RE2 common subset so the
# same strings run verbatim in Spark and the DuckDB oracle.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Country code optional: a bare US number like 555-123-4567 must be
# caught too (it is PII with or without the +1).
PHONE_PATTERN = r"(\+?\d{1,2} ?)?\d{3}-\d{3}-\d{4}"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_PATTERN,
    "phone": PHONE_PATTERN,
}


def pii_counts(text_col) -> list[tuple[str, Column]]:
    """Per-category PII match counts (email, phone) — the audit half
    of the scrub. Pure JVM regexp, zero shuffle."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        (name, F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))))
        for name, pat in sorted(PII_PATTERNS.items())
    ]


def scrub_pii(text_col) -> Column:
    """Redact PII in-place: every category match is replaced by its
    ``[CATEGORY]`` token (emails first so phone digits inside an
    address never double-fire). The standard pre-training scrub pass;
    swap/extend PII_PATTERNS for a deployment's own inventory."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat in sorted(PII_PATTERNS.items()):
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return c


def ngram_repetition_signals(
    df: DataFrame, text_col: str, id_col: str, ns: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """Gopher-style multi-n repetition signals per document: for each
    ``n`` in ``ns``, the fraction of token n-grams claimed by the most
    frequent one (``top_{n}gram_frac``) — the full repetition ladder
    next to :func:`repetition_signals`'s bigram-only pair.

    Docs with fewer than ``min(ns)`` tokens are dropped; a column is
    NULL when the doc is shorter than that ``n``.

    Scale: ONE corpus scan fans every (n, ngram-hash) occurrence out of
    a single explode; two partially-aggregated key shuffles ((doc, n,
    hash) count then per-(doc, n) max/sum); the per-doc column pivot is
    a conditional aggregation, not a join. N-grams travel as
    ``xxhash64`` over the n token columns — 8 bytes per occurrence in
    the shuffle, never the text (same rationale as
    :func:`repetition_signals`).
    """
    ns = tuple(sorted(set(int(n) for n in ns)))
    if not ns or ns[0] < 2:
        raise ValueError(f"ns must all be >= 2, got {ns!r}")

    def grams(n: int) -> Column:
        # guarded like repetition_signals: Catalyst may evaluate the
        # projection on pre-filter rows, where sequence(0, -k) is a
        # descending 2-element sequence rather than empty
        return F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.xxhash64(
                        *[
                            F.element_at("_toks", (i + j + 1).cast("int"))
                            for j in range(n)
                        ]
                    ).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,h:bigint>>"))

    base = (
        df.withColumn("_toks", tokens(text_col))
        .where(F.size("_toks") >= ns[0])
        .select(
            F.col(id_col),
            F.explode(F.flatten(F.array(*[grams(n) for n in ns]))).alias("_g"),
        )
    )
    per_gram = base.groupBy(id_col, "_g.n", "_g.h").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_n = per_gram.groupBy(id_col, "n").agg(
        F.max("_c").alias("_top"), F.sum("_c").alias("_total")
    )
    frac = F.floor(F.col("_top") / F.col("_total") * 10000) / 10000
    return per_n.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, frac)).alias(f"top_{n}gram_frac")
            for n in ns
        ]
    )


def token_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document Shannon entropy (bits) of the token distribution —
    near-zero entropy flags degenerate/repeated-token spam that ratio
    signals miss. Uses the closed form
    ``H = log2(n) - sum(c_i * log2(c_i)) / n`` so the aggregation is a
    plain sum, no per-token probability column.

    Output: (id, n_tokens, token_entropy), entropy floor-rounded to
    1e-4 (cross-engine float determinism). Empty docs are dropped.

    Scale: one scan, one (doc, token-hash) partially-aggregated
    shuffle, one per-doc shuffle — same shape as repetition_signals;
    the token travels as xxhash64 (counts never need the string back).
    """
    cnt = (
        df.withColumn("_toks", tokens(text_col))
        .where(F.size("_toks") >= 1)
        .select(F.col(id_col), F.explode("_toks").alias("_t"))
        .groupBy(id_col, F.xxhash64("_t").alias("_h"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    n = F.sum("_c")
    h = F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n
    return cnt.groupBy(id_col).agg(
        n.cast("bigint").alias("n_tokens"),
        (F.floor(h * 10000) / 10000).alias("token_entropy"),
    )


def repetition_signals(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_bigram_frac``: occurrences of the most frequent token
      bigram over total bigrams — boilerplate/template detector;
    - ``dup_token_frac``: 1 - distinct/total tokens — spam detector.

    Docs with fewer than 2 tokens are dropped (no bigram exists).
    Scale: ONE corpus scan -> explode bigrams -> two partially-
    aggregated key shuffles ((doc, bigram) count, then per-doc
    max/sum). The per-doc token stats (n, nd) ride the aggregations
    as first()s instead of a join back to a second tokenization pass
    (the join formulation re-evaluated the tokenize+bigram projection
    twice). Pure JVM, no Python UDFs.

    The bigram key is ``xxhash64(tok_i, tok_{i+1})``, not the
    concatenated string: the count aggregation never needs the string
    back (output is fractions only), so the (doc, bigram) shuffle
    carries 8 bytes per occurrence instead of the two-token text —
    at corpus scale the string key is ~2x the corpus in shuffle bytes.
    Hash collisions inside one doc would merge two bigram counts;
    at 64 bits that is ~n^2/2^65 per doc — vanishing for any real doc.

    Plan note: the explode lives IN the projection that builds the
    bigram array. Exploding a column alias from a *previous* select
    measures 12-30x slower on this chain (the generator input is
    re-evaluated, turning the per-doc work quadratic); same rule as
    ngram_repetition_signals / exploded_shingles.
    """
    base = df.withColumn("_toks", tokens(text_col)).where(
        F.size("_toks") >= 2
    )
    # guarded like shingles_from_tokens: the filter above is not
    # enough — Catalyst may evaluate the projection's expression tree
    # on pre-filter rows (sequence(0,-1) is a DESCENDING 2-element
    # sequence, not empty)
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 2),
            lambda i: F.xxhash64(
                F.element_at("_toks", (i + 1).cast("int")),
                F.element_at("_toks", (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    cnt = (
        base.select(
            F.col(id_col),
            F.size("_toks").alias("_n"),
            F.size(F.array_distinct("_toks")).alias("_nd"),
            F.explode(bigrams).alias("_b"),
        )
        .groupBy(id_col, "_b")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.first("_n").alias("_n"),
            F.first("_nd").alias("_nd"),
        )
    )
    top = cnt.groupBy(id_col).agg(
        F.max("_c").alias("_top"),
        F.sum("_c").alias("_total"),
        F.first("_n").alias("_n"),
        F.first("_nd").alias("_nd"),
    )
    return top.select(
        F.col(id_col),
        (F.floor(F.col("_top") / F.col("_total") * 10000) / 10000).alias(
            "top_bigram_frac"
        ),
        (
            F.floor((1 - F.col("_nd") / F.col("_n")) * 10000) / 10000
        ).alias("dup_token_frac"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Corpus-wide frequent token n-grams — the boilerplate/template
    miner (headers, disclaimers, navigation chrome surface here
    first). Output: (ngram, n_docs, n_occurrences) for every n-gram
    with at least ``min_count`` occurrences. Threshold semantics, not
    top-k: no tie ambiguity, and "drop text matching boilerplate above
    threshold" is the real downstream curation step.

    Scale: TWO passes so the corpus-wide shuffle never carries text.
    Pass 1 counts by xxhash64(n-gram) — 8 bytes per occurrence — and
    keeps the qualifying hashes (bounded by how much true boilerplate
    exists; raise ``min_count`` if a pathological corpus overflows the
    broadcast). Pass 2 rescans and BROADCAST-joins occurrences against
    the qualifying hash set — no driver collect, no giant `isin`
    literal (a 100k-element isin list measured ~30x slower than the
    join at sf0.1) — then aggregates by the actual string to recover
    the n-gram text. Two scans beat one string-keyed shuffle at corpus
    scale; the second shuffle is boilerplate-sized.
    """
    if n < 1 or min_count < 1:
        raise ValueError(f"n and min_count must be >= 1, got {n=} {min_count=}")

    def grams_hashed():
        # hash the JOINED string (not the n token columns) so phase 2's
        # xxhash64(ngram) recomputes the identical value; the string is
        # built and hashed map-side, it never reaches the shuffle
        return F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.xxhash64(
                    F.concat_ws(
                        " ",
                        *[
                            F.element_at("_toks", (i + j + 1).cast("int"))
                            for j in range(n)
                        ],
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    def grams_text():
        return F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.element_at("_toks", (i + j + 1).cast("int"))
                        for j in range(n)
                    ],
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = df.withColumn("_toks", tokens(text_col)).where(F.size("_toks") >= n)
    qualifying = (
        base.select(F.explode(grams_hashed()).alias("_h"))
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_h")
    )
    hits = base.select(
        F.col(id_col).alias("_doc"),
        F.explode(grams_text()).alias("ngram"),
    ).withColumn("_h", F.xxhash64("ngram"))
    return (
        hits.join(F.broadcast(qualifying), "_h")
        .groupBy("ngram")
        .agg(
            F.countDistinct("_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
    )


def ngram_novelty(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    """Per-doc CROSS-corpus n-gram novelty: the fraction of a doc's
    distinct ``shingle_n``-gram shingles that appear in NO other
    document — the originality signal next to the intra-doc
    ``repetition_signals`` family. Boilerplate-heavy and templated
    docs score near 0, genuinely novel text near 1; curation pipelines
    use it both as a quality feature and as a memorization-risk flag
    (a doc whose shingles are all df=1 is uniquely attributable).
    Output: (id, n_shingles, novelty), docs shorter than ``shingle_n``
    tokens dropped.

    Scale: shingles shuffle as 60-bit md5-prefix ints (text never
    shuffles) and document frequency is a COUNT WINDOW over the hash —
    the tokenize/shingle pass runs ONCE and feeds one
    occurrence-scale (id, hash) exchange, vs. the prior df-table
    self-join that re-tokenized the corpus per side and let the
    planner broadcast an occurrence-scale build table (an OOM hazard
    the moment the corpus outgrows the bench). A shingle's df counts
    documents (per-doc shingles are distinct by construction), so
    df = 1 means "this doc only". The not-null guard keeps the old
    inner-join null-key semantics bit-identical."""
    from pyspark.sql import Window

    from petastorm_spark.operators.dedup import exploded_shingles, hash60

    sh = exploded_shingles(df, text_col, id_col, shingle_n).select(
        F.col(id_col), hash60("sh").alias("_h")
    )
    return (
        sh.where(F.col("_h").isNotNull())
        .withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("_h"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.sum((F.col("_df") == 1).cast("int")) / F.count(F.lit(1)), 4
            ).alias("novelty"),
        )
    )


def token_psi(
    df_a: DataFrame, df_b: DataFrame, text_col: str
) -> DataFrame:
    """Corpus drift detection: per-token Population Stability Index
    terms between two corpus snapshots — THE monitoring signal for
    "did this ingest batch shift the distribution" (total PSI < 0.1
    stable, > 0.25 action). Output: (token, p_a, p_b, psi_term), PSI
    probabilities additively smoothed (+0.5) over the union
    vocabulary so a token absent from one side contributes a finite
    term; sum(psi_term) is the corpus PSI.

    Scale: each side is one explode + one partially-aggregated count
    shuffle (vocabulary-sized output); the two count tables full-outer
    join on the token (vocab-scale, not corpus-scale) and the totals
    arrive as a broadcast 1-row cross join — no window over the
    vocabulary, no driver collect.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.withColumn("_toks", tokens(text_col))
            .select(F.explode("_toks").alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca = counts(df_a, "_ca")
    cb = counts(df_b, "_cb")
    joined = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    totals = joined.agg(
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
        F.count(F.lit(1)).alias("_v"),
    )
    p_a = (F.col("_ca") + 0.5) / (F.col("_na") + 0.5 * F.col("_v"))
    p_b = (F.col("_cb") + 0.5) / (F.col("_nb") + 0.5 * F.col("_v"))
    psi = (p_a - p_b) * F.log(p_a / p_b)
    f6 = lambda c: F.floor(c * 1000000) / 1000000  # noqa: E731
    return joined.crossJoin(F.broadcast(totals)).select(
        "token",
        f6(p_a).alias("p_a"),
        f6(p_b).alias("p_b"),
        f6(psi).alias("psi_term"),
    )


def token_label_mi(
    df: DataFrame,
    text_col: str,
    label_col: str,
    min_df: int = 5,
) -> DataFrame:
    """Mutual-information terms between TOKEN PRESENCE and a document
    label — the supervised feature-selection signal (Manning et al.,
    IR ch. 13) for building quality/domain classifiers on top of this
    corpus: high-MI tokens are the vocabulary a linear gate should
    look at, where PMI (:func:`pmi_cooccurrence`) ranks token-token
    association and PSI (:func:`token_psi`) ranks drift. One row per
    (token, label) over the FULL vocab x label grid: (token, label,
    n_tl, n_t, n_l, mi_term) with mi_term the label's present+absent
    contribution; sum(mi_term) over a token's rows is its full MI.

    Exactness: every count is an exact integer (doc-level presence via
    per-doc distinct tokens); mi_term combines them with IEEE double
    division and ln over identical integers, rounded to 6 — the
    unigram_logprob contract. Zero-count cells contribute exactly 0.

    Scale: one explode + (token, label) partial-agg count (vocab x
    labels output), token totals from that same table, the label and
    corpus totals broadcast (labels are few, the corpus count is one
    row) — the grid is a broadcast cross join on the vocab-scale
    table, never corpus-scale."""
    base = df.select(
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
        F.col(label_col).alias("label"),
    )
    tl = base.groupBy("token", "label").agg(
        F.count(F.lit(1)).alias("n_tl")
    )
    tcnt = (
        tl.groupBy("token")
        .agg(F.sum("n_tl").alias("n_t"))
        .where(F.col("n_t") >= min_df)
    )
    lcnt = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    ncnt = df.agg(F.count(F.lit(1)).alias("N"))
    # a NULL label is its own class (groupBy counted it that way) —
    # the grid join must be null-safe on label or those classes'
    # n_tl would silently zero while still inflating n_t/n_l/N
    tlj = tl.select(
        F.col("token").alias("_r_token"),
        F.col("label").alias("_r_label"),
        F.col("n_tl").alias("_r_ntl"),
    )
    gb = tcnt.crossJoin(F.broadcast(lcnt))
    grid = (
        gb.join(
            tlj,
            (gb["token"] == tlj["_r_token"])
            & gb["label"].eqNullSafe(tlj["_r_label"]),
            "left",
        )
        .select(
            gb["token"],
            gb["label"],
            gb["n_t"],
            gb["n_l"],
            F.coalesce(tlj["_r_ntl"], F.lit(0)).alias("n_tl"),
        )
        .crossJoin(F.broadcast(ncnt))
    )
    n = F.col("N").cast("double")
    ntl = F.col("n_tl").cast("double")
    nt = F.col("n_t").cast("double")
    nl = F.col("n_l").cast("double")
    t1 = F.when(
        F.col("n_tl") > 0,
        (ntl / n) * F.log((n * ntl) / (nt * nl)),
    ).otherwise(F.lit(0.0))
    t2 = F.when(
        ((F.col("n_l") - F.col("n_tl")) > 0)
        & ((F.col("N") - F.col("n_t")) > 0),
        ((nl - ntl) / n) * F.log((n * (nl - ntl)) / ((n - nt) * nl)),
    ).otherwise(F.lit(0.0))
    return grid.select(
        "token",
        "label",
        F.col("n_tl").cast("long").alias("n_tl"),
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_l").cast("long").alias("n_l"),
        F.round(t1 + t2, 6).alias("mi_term"),
    )


def feature_hash_embed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Signed feature-hashing embedding (the hashing trick, Weinberger
    et al. 2009): each token lands in bucket hash % dim with sign
    (hash div dim) % 2, summed per document — a model-free,
    vocabulary-free text vectorization that feeds this repo's ENTIRE
    similarity stack (cosine top-k, LSH, IVF, kNN graph, semantic
    dedup) directly from the text column. Signed sums make collisions
    cancel in expectation, the property that lets a 64-dim hash space
    stand in for an unbounded vocabulary. Output: (id_col, embedding
    array<double>), raw signed counts (chain
    :func:`operators.similarity.normalize_embeddings` for unit
    vectors).

    Engine-exact: md5-keyed buckets/signs and integer sums; the dense
    array is assembled per doc from a bucket->sum map, missing buckets
    exactly 0.0. Scale: one explode + (id, bucket) partial-agg (the
    exchange carries <= dim rows per doc), one per-doc map-assembly
    agg — no grid join, no windows."""
    from petastorm_spark.operators.dedup import hash60

    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_t")
    )
    h = toks.select(
        id_col, hash60(F.col("_t"), seed=seed).alias("_h")
    ).select(
        id_col,
        (F.col("_h") % dim).cast("int").alias("_b"),
        F.when(F.expr(f"(_h div {dim}) % 2 = 0"), F.lit(1))
        .otherwise(F.lit(-1))
        .alias("_s"),
    )
    c = h.groupBy(id_col, "_b").agg(F.sum("_s").alias("_v"))
    m = c.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m")
    )
    # a doc with NO tokens (NULL text) must still embed — as the zero
    # vector — or it silently vanishes from every downstream
    # similarity join; element_at(NULL map, i) is NULL -> coalesce 0
    m = df.select(id_col).join(m, id_col, "left")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")), F.lit(0).cast("long")
        ).cast("double"),
    )
    return m.select(id_col, emb.alias("embedding"))


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document top-``k`` characteristic terms by TF-IDF — the
    keyword/topic-surfacing primitive (doc routing, cluster labeling,
    index-time keyword extraction). Smoothed sklearn-style idf
    ``ln((1+N)/(1+df)) + 1`` so corpus-universal terms still rank
    (weighted by tf) instead of zeroing out.

    Output: ``(id, term, tfidf, rank)``, tfidf floor-scaled to 1e-4;
    ranking orders by the FLOOR-SCALED value (desc) then term (asc) so
    rank boundaries are engine-exact — ranking on the raw double
    invites last-ulp rank flips between engines (ln is not correctly
    rounded in either).

    Scale: one explode -> partially-aggregated (doc, term) tf counts;
    document frequencies reduce off the same aggregate (term-keyed,
    vocab-scale) and broadcast back; the per-doc top-k is a window
    over the (doc, term) table partitioned by doc — the shuffle
    carries one row per DISTINCT (doc, term), not per occurrence.
    The term string must travel (it IS the output), so this op
    deliberately trades the hash-key trick of repetition_signals for
    a distinct-pairs-sized exchange.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = (
        df.withColumn("_toks", tokens(text_col))
        .where(F.size("_toks") >= 1)
        .select(F.col(id_col), F.explode("_toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    n_docs = df.where(
        F.size(tokens(text_col)) >= 1
    ).agg(F.count(F.lit(1)).alias("_n"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            (F.log((1 + F.col("_n")) / (1 + F.col("_df"))) + 1).alias("_idf"),
        )
    )
    scored = tf.join(F.broadcast(dfreq), "term").select(
        F.col(id_col),
        "term",
        (F.floor(F.col("_tf") * F.col("_idf") * 10000) / 10000).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), "term", "tfidf", "rank")
    )


# BPE-style pre-tokenizer regex, written to the Java-regex / RE2
# common subset (no lookahead — RE2 rejects GPT-2's (?!\S); ASCII
# classes so both engines agree byte-for-byte). Splits words,
# numbers, punctuation runs, and whitespace the way byte-pair
# tokenizers pre-segment — counts land within a few % of a real BPE
# vocab's, close enough for cost estimation and length bucketing.
BPE_SPLIT_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count_bpe(text_col) -> Column:
    """BPE-style token count: matches of :data:`BPE_SPLIT_PATTERN` —
    the training-cost estimator (whitespace counts undercount code /
    punctuation-heavy text badly). Pure JVM regexp, zero shuffle."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def numeric_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Numeric drift: per-bin PSI terms of a numeric column between
    two snapshots over FIXED bins ([lo, hi) split into ``n_bins``
    equal widths, plus underflow bin -1 and overflow bin ``n_bins``) —
    fixed edges deliberately: quantile-derived edges move with the
    data and hide exactly the drift being measured. Same +0.5
    smoothing and sum(psi_term) semantics as :func:`token_psi`.
    Output: (bin, p_a, p_b, psi_term), floor-scaled 1e-6.

    Scale: two map-side bin assignments + two (n_bins+2)-row counts,
    one tiny outer join — nothing row-scale shuffles.
    """
    if not hi > lo or n_bins < 1:
        raise ValueError(f"need hi > lo and n_bins >= 1, got {lo=} {hi=} {n_bins=}")
    width = (hi - lo) / n_bins

    def bins(df: DataFrame, name: str) -> DataFrame:
        c = F.col(value_col) if isinstance(value_col, str) else value_col
        b = (
            F.when(c < lo, F.lit(-1))
            .when(c >= hi, F.lit(n_bins))
            .otherwise(F.floor((c - lo) / width).cast("int"))
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(name)
        )

    a = bins(df_a, "_ca")
    b = bins(df_b, "_cb")
    joined = a.join(b, "bin", "full_outer").select(
        "bin",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    totals = joined.agg(
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
        F.count(F.lit(1)).alias("_v"),
    )
    p_a = (F.col("_ca") + 0.5) / (F.col("_na") + 0.5 * F.col("_v"))
    p_b = (F.col("_cb") + 0.5) / (F.col("_nb") + 0.5 * F.col("_v"))
    psi = (p_a - p_b) * F.log(p_a / p_b)
    f6 = lambda c: F.floor(c * 1000000) / 1000000  # noqa: E731
    return joined.crossJoin(F.broadcast(totals)).select(
        "bin", f6(p_a).alias("p_a"), f6(p_b).alias("p_b"),
        f6(psi).alias("psi_term"),
    )


def normalize_text(text_col) -> Column:
    """Canonical text for robust dedup/fingerprinting: lowercase,
    every non-alphanumeric run collapsed to one space, trimmed — so
    case changes, punctuation noise, and whitespace tricks don't
    defeat exact-hash dedup (the standard pre-hash normalization;
    NFKC/accent folding slots in upstream where the deployment's
    unicode tables live). Pure JVM regexp, zero shuffle; the pattern
    is in the Java/RE2 common subset so oracles reproduce it
    verbatim."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def linear_classifier_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_features: int = 1024,
    weights: dict[int, float] | None = None,
    seed: int = 0,
    scale: float = 8.0,
) -> DataFrame:
    """Apply a linear bag-of-words classifier (the fastText-style
    quality-classifier shape used to score pretraining corpora, e.g.
    GPT-3/LLaMA's "pages that look like references" filters) with the
    hashing trick: each token hashes to one of ``n_features`` buckets,
    the document's score is ``sigmoid(scale * mean(w[bucket(tok)]))``.
    Output: (id, n_tokens, score, label).

    ``weights``: a trained model's weight vector as {bucket: weight}
    (missing buckets = 0.0) — shipped as a map literal when small, or
    automatically as a broadcast-joined weight table past 10k buckets
    (a plan-embedded literal that wide would bloat compilation);
    either way inference is pure JVM, no Python anywhere.
    Default (None) derives a deterministic pseudo-weight per bucket
    from md5 (w_j = 2*frac(md5("w<seed>|j")) - 1), so external SQL
    oracles can reproduce scoring bit-for-bit without shipping a
    model.

    Scale: explode -> per-token expressions -> one groupBy(id). The
    shuffle carries only (id, weight-sum partials) thanks to partial
    aggregation; the weight map is O(n_features) on each executor.
    """
    from petastorm_spark.operators.dedup import hash60
    from petastorm_spark.predicates import HASH_SPACE

    t = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).withColumn(
        "_bucket",
        hash60(F.col("_tok"), seed=f"qc{seed}") % F.lit(int(n_features)),
    )
    if weights is not None and len(weights) > 10_000:
        # a map LITERAL this wide would bloat the plan itself; ship the
        # weight vector as a broadcast table and join on the bucket
        from petastorm_spark.session import arrow_local_df

        wdf = arrow_local_df(
            df.sparkSession,
            {
                "_bucket": [int(k) for k in weights],
                "_wj": [float(v) for v in weights.values()],
            },
            "_bucket bigint, _wj double",
        )
        t = t.join(F.broadcast(wdf), "_bucket", "left")
        w = F.coalesce(F.col("_wj"), F.lit(0.0))
    elif weights is not None:
        wmap = F.create_map(
            *[F.lit(v) for kv in weights.items() for v in kv]
        )
        w = F.coalesce(
            F.element_at(wmap, F.col("_bucket").cast("int")), F.lit(0.0)
        )
    else:
        frac = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"w{seed}|"), F.col("_bucket").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            / F.lit(HASH_SPACE)
        ).cast("double")
        w = F.lit(2.0) * frac - F.lit(1.0)
    agg = (
        t.withColumn("_w", w)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("_w").alias("_mean_w"),
        )
    )
    raw = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(float(scale)) * F.col("_mean_w")))
    return agg.select(
        F.col(id_col),
        "n_tokens",
        F.round(raw, 4).alias("score"),
        (raw >= 0.5).alias("label"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 2,
    max_postings: int = 1000,
) -> DataFrame:
    """Build a term -> posting-list search index (the offline half of
    BM25 serving): (term, df, postings) with postings the sorted doc
    ids containing the term, truncated to ``max_postings`` (df stays
    exact). Output rows are parquet-ready — partition by a term-hash
    prefix at write time so lookups prune to one directory.

    Scale: one distinct-terms explode, then the exact document
    frequency as a partial-aggregated count; below-``min_df`` terms
    (the long tail, typically most of the vocabulary) are dropped via
    a semi-join BEFORE any ranking work. The posting cap is a
    ``row_number`` window partitioned by term — the vocabulary is
    HIGH-cardinality, so per-term windows parallelize across the
    whole cluster and never broadcast vocabulary-sized state (the
    low-cardinality pathology grouped_rank exists for does not apply
    here) — and only each term's ``max_postings`` lowest doc ids ever
    reach a collect_list buffer (a slice AFTER collect would bound
    the output but not the buffer). Production indexes shard hot
    terms' full lists by ``doc_id % k`` side tables."""
    from pyspark.sql import Window

    t = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(text_col))).alias("term"),
        )
        .where(F.length("term") > 0)
    )
    counts = (
        t.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    qualified = t.join(counts.select("term"), "term", "left_semi")
    w = Window.partitionBy("term").orderBy(id_col)
    capped = qualified.withColumn("_r", F.row_number().over(w)).where(
        F.col("_r") <= max_postings
    )
    postings = capped.groupBy("term").agg(
        F.sort_array(F.collect_list(id_col)).alias("postings")
    )
    return counts.join(postings, "term").select("term", "df", "postings")


def pmi_cooccurrence(
    df: DataFrame,
    text_col: str,
    window: int = 2,
    min_pair_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of co-occurring token pairs within
    a +/-``window`` skip-gram window — the word2vec/GloVe
    preprocessing statistic and a collocation miner. Pairs are
    unordered (canonicalized least/greatest); PMI uses natural log:
    ln( (C(a,b)/T_p) / ((C(a)/T_u) * (C(b)/T_u)) ). Output:
    (a, b, pair_count, pmi), pairs with count >= ``min_pair_count``.

    Scale: pair generation is a per-row explode (never a positional
    self-join); pair and unigram counts partial-aggregate before their
    shuffles; the two count joins are on the (skew-bounded by
    min_pair_count) pair table; corpus totals ride in via a 1-row
    cross join."""
    toks = df.select(tokens(text_col).alias("t"))

    # single-parameter lambda per offset: a two-parameter lambda would
    # be treated by F.transform as (element, index) and shadow `off`
    def _pair_fn(off: int):
        return lambda i: F.struct(
            F.least(
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + off),
            ).alias("a"),
            F.greatest(
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + off),
            ).alias("b"),
        )

    pair_arrays = []
    for off in range(1, window + 1):
        pair_arrays.append(
            F.when(
                F.size("t") > off,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - off), _pair_fn(off)
                ),
            ).otherwise(
                F.array().cast("array<struct<a:string,b:string>>")
            )
        )
    pairs = toks.select(
        F.explode(F.concat(*pair_arrays)).alias("p")
    ).select("p.a", "p.b")
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("pair_count"))
    pc = pc.where(F.col("pair_count") >= min_pair_count)
    uni = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = pairs.groupBy().agg(F.count(F.lit(1)).alias("tp")).crossJoin(
        uni.groupBy().agg(F.sum("c").alias("tu"))
    )
    ca = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    cb = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    pmi = F.log(
        (F.col("pair_count") / F.col("tp"))
        / ((F.col("ca") / F.col("tu")) * (F.col("cb") / F.col("tu")))
    )
    return (
        pc.join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            F.col("pair_count").cast("bigint").alias("pair_count"),
            F.round(pmi, 4).alias("pmi"),
        )
    )


def zipf_fit(
    df: DataFrame, text_col: str, top_n: int = 1000
) -> DataFrame:
    """Zipf's-law fit over the corpus token frequency distribution:
    least-squares slope of ln(freq) against ln(rank) for the top
    ``top_n`` tokens, plus the fit's r^2 and the token count covered.
    Natural corpora sit near slope -1; a flat slope flags synthetic /
    boilerplate-heavy text and a cliff flags truncated vocabularies —
    the one-glance distribution-health number next to token_entropy's
    per-document signal. Output: one row
    (n_tokens_fit, zipf_slope, r2).

    Scale: ONE token-count aggregate (partial-agg, vocabulary-sized
    exchange); the rank window runs over the top-``top_n`` slice only
    (TakeOrdered, never a full sort); the regression is five scalar
    sums over ``top_n`` rows. Ranking ties break on the token string
    so ranks are engine-exact; the ln() sums are rounded to 4 before
    comparison."""
    from pyspark.sql import Window

    if top_n < 2:
        raise ValueError(f"top_n must be >= 2, got {top_n}")
    counts = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(top_n)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    ranked = top.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    # guards: varx > 0 always holds for n >= 2 (ranks are distinct) but
    # keep it explicit; vary == 0 (all frequencies equal) makes r2
    # undefined -> NULL, and slope is exactly 0 there (ANSI mode turns
    # the bare division into a hard error otherwise)
    return agg.select(
        n.cast("bigint").alias("n_tokens_fit"),
        F.round(
            F.when(varx > 0, cov / varx).otherwise(F.lit(0.0)), 4
        ).alias("zipf_slope"),
        F.round(
            F.when((varx > 0) & (vary > 0), (cov * cov) / (varx * vary)),
            4,
        ).alias("r2"),
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model_df: DataFrame | None = None,
    alpha: float = 0.4,
    micro: int = 10**6,
) -> DataFrame:
    """Per-document bigram language-model score with STUPID BACKOFF
    (Brants et al. 2007, "Large Language Models in Machine
    Translation" — the scoring rule invented FOR distributed
    count-based LMs, because it needs no held-out normalization pass):

        S(w2 | w1) = c(w1 w2) / c(w1)                 if c(w1 w2) > 0
                     alpha * max(c(w2), 1) / N        otherwise

    (the ``max(., 1)`` is the standard unknown-word floor — an
    out-of-vocabulary w2 scores ``alpha / N`` instead of ln 0). The
    model is counted over ``model_df`` (default: ``df`` itself — score
    the training corpus); pass a SUBSET (one source, a reference
    corpus) to get the CCNet-style quality signal: held-out documents
    hit the backoff and score low. This is the count-based step up
    from perplexity_buckets' unigram proxy.

    Output per document (docs with >= 2 tokens):
    (id, n_bigrams, seen_bigrams, score_micro, avg_logprob) where
    ``score_micro`` = sum over bigram occurrences of
    floor(ln(S) * micro) — each term floor-scaled to an INTEGER before
    summing, so the per-doc total is addition-order-independent and
    bit-stable across engines (the established micro-unit contract);
    ``avg_logprob`` = round(score_micro / micro / n_bigrams, 4).

    Scale: both count tables partial-aggregate before their one
    shuffle each (bigram types, unigram types); the corpus total rides
    a 1-row broadcast; scoring is doc-bigram-TYPES left-joined to the
    model tables (shuffle joins on the token keys — both sides are
    already type-deduped, so the exchanges carry vocabulary-sized
    data, zipf-small relative to the corpus) and one final groupBy on
    the doc id. No driver collect anywhere."""
    if model_df is None:
        model_df = df
    big, muni, n_total = bigram_lm_model(model_df, text_col)
    return lm_score_from_model(
        df, text_col, id_col, big, muni, n_total, alpha=alpha, micro=micro
    )


def _bigram_pairs(frame: DataFrame, text_col: str, *keep) -> DataFrame:
    """One row per adjacent-token pair occurrence: (*keep, w1, w2)."""
    t = tokens(text_col)
    n = F.size(t)
    z = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    return (
        frame.where(F.size(tokens(text_col)) >= 2)
        .select(*keep, F.explode(z).alias("_p"))
        .select(*keep, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def bigram_lm_model(
    model_df: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The count tables a stupid-backoff scorer reads:
    ``(bigram_counts (w1, w2, _c2), unigram_counts (w, _c1),
    total (1-row _n double))``. Persist these as parquet to score
    ingest streams against a frozen model
    (:func:`petastorm_spark.streaming.feed.lm_score_stream`)."""
    big = _bigram_pairs(model_df, text_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c2")
    )
    muni = (
        model_df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("_c1"))
    )
    n_total = muni.agg(F.sum("_c1").cast("double").alias("_n"))
    return big, muni, n_total


def lm_score_from_model(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    big: DataFrame,
    muni: DataFrame,
    n_total: DataFrame,
    alpha: float = 0.4,
    micro: int = 10**6,
    pre_aggregate: bool = True,
) -> DataFrame:
    """Score documents against prebuilt :func:`bigram_lm_model` count
    tables (the search half of :func:`bigram_lm_score`). With
    ``pre_aggregate`` (batch default) per-doc bigram TYPES are counted
    before the model joins, shrinking join volume to type counts;
    ``pre_aggregate=False`` scores per occurrence — required on a
    streaming input, where the type count would be a second chained
    streaming aggregation (unsupported), and bit-identical to the
    batch path because every term is floor-scaled to an integer BEFORE
    summation."""
    if pre_aggregate:
        dpc = _bigram_pairs(docs, text_col, id_col).groupBy(
            id_col, "w1", "w2"
        ).agg(F.count(F.lit(1)).alias("_cdoc"))
    else:
        dpc = _bigram_pairs(docs, text_col, id_col).withColumn(
            "_cdoc", F.lit(1).cast("bigint")
        )
    joined = (
        dpc.join(big, ["w1", "w2"], "left")
        .join(
            muni.select(F.col("w").alias("w1"), F.col("_c1").alias("_c1w1")),
            "w1", "left",
        )
        .join(
            muni.select(F.col("w").alias("w2"), F.col("_c1").alias("_c1w2")),
            "w2", "left",
        )
        .crossJoin(F.broadcast(n_total))
    )
    s = F.when(
        F.col("_c2").isNotNull(), F.col("_c2") * F.lit(1.0) / F.col("_c1w1")
    ).otherwise(
        F.lit(alpha)
        * (
            F.greatest(F.coalesce(F.col("_c1w2"), F.lit(0)), F.lit(1))
            * F.lit(1.0)
            / F.col("_n")
        )
    )
    term = F.floor(F.log(s) * F.lit(float(micro))).cast("bigint") * F.col("_cdoc")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("_cdoc").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.when(F.col("_c2").isNotNull(), F.col("_cdoc")).otherwise(F.lit(0))
            ).cast("bigint").alias("seen_bigrams"),
            F.sum(term).cast("bigint").alias("score_micro"),
        )
        .withColumn(
            "avg_logprob",
            F.round(
                F.col("score_micro") / F.lit(float(micro)) / F.col("n_bigrams"), 4
            ),
        )
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    n_points: int = 16,
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (Heaps 1978: V ~ K * n^beta,
    beta ~ 0.4-0.6 for natural language): the corpus is walked in
    ``order_col`` order and at ``n_points`` evenly-spaced prefixes the
    CUMULATIVE token count and DISTINCT vocabulary size are reported —
    one (ln n, ln V) point per row, so the Heaps exponent is the slope
    an external fit reads off. The growth diagnostic next to Zipf
    (zipf_corpus_fit is the static rank law; this is the accretion
    law): a corpus whose vocab curve flattens early is repetitive /
    template-heavy; synthetic data often shows beta near 0 or 1.

    Exactness: a token's contribution to every prefix is decided by
    its FIRST occurrence rank (min global row_number of its doc), so
    vocab-at-prefix is one integer count per point — no re-scan per
    point, no approximate distinct. ln values are IEEE doubles over
    identical integers (the unigram_logprob contract), rounded to 6.

    Scale: the global order rank uses :func:`operators.rank.global_rank`
    (range exchange + broadcast offsets — no single-task window); one
    token explode feeds BOTH the first-occurrence table (vocab-sized)
    and the per-doc token counts; the prefix thresholds are a
    broadcast ``n_points``-row literal, so the theta-joins are
    nested-loop over a 16-row broadcast, never a shuffle."""
    from petastorm_spark.operators.rank import global_rank
    from petastorm_spark.session import arrow_local_df

    n = df.count()
    if n == 0:
        raise ValueError("vocab_growth needs a non-empty corpus")
    pts = [
        (k, (n * k + n_points - 1) // n_points) for k in range(1, n_points + 1)
    ]
    points = F.broadcast(
        arrow_local_df(
            df.sparkSession,
            {"point": [p[0] for p in pts], "prefix_docs": [p[1] for p in pts]},
            "point int, prefix_docs bigint",
        )
    )
    ranked = global_rank(
        df.select(F.col(order_col), F.col(text_col)), [order_col], "rn"
    )
    tok = ranked.select(
        F.col("rn"), F.explode(tokens(text_col)).alias("token")
    )
    firsts = tok.groupBy("token").agg(F.min("rn").alias("first_rn"))
    dtc = tok.groupBy("rn").agg(F.count(F.lit(1)).alias("tc"))
    voc = (
        firsts.join(points, F.col("first_rn") <= F.col("prefix_docs"))
        .groupBy("point", "prefix_docs")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    )
    cum = (
        dtc.join(points, F.col("rn") <= F.col("prefix_docs"))
        .groupBy("point")
        .agg(F.sum("tc").cast("bigint").alias("n_tokens_cum"))
    )
    ln6 = lambda c: F.when(  # noqa: E731
        c > 0, F.round(F.log(c.cast("double")), 6)
    )
    return voc.join(cum, "point").select(
        "point",
        "prefix_docs",
        "n_tokens_cum",
        "vocab",
        ln6(F.col("n_tokens_cum")).alias("ln_tokens"),
        ln6(F.col("vocab")).alias("ln_vocab"),
    )
