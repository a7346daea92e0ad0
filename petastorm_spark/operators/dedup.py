"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard near-dup.

Everything is expressed with built-in Spark SQL functions (JVM-side);
hashes are md5-prefix integers so the semantics are reproducible in
any engine (the DuckDB oracles recompute them bit-for-bit).

Scale design notes (100 TB):
  - exact dedup: one hash-shuffle on the digest — the minimum possible;
  - minhash signatures: pure map (explode shingles -> 16 min-aggregates
    per doc); LSH banding turns all-pairs into per-bucket joins, the
    standard linear-ish near-dup path;
  - simhash: pure map + one small agg; near-dup PAIRS via banded
    self-join on fingerprint bit-bands (simhash_dup_pairs) — pigeonhole
    makes the bucket join exact for hamming <= bands-1;
  - jaccard pairs: inverted-index self-join on shingles — quadratic in
    per-shingle posting length; always run it AFTER LSH/banding has cut
    candidates (the exposed query keeps a selective shingle set).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from petastorm_spark.operators.text import tokens

# 60-bit integer from an md5 prefix, seedable. Matches the oracle SQL
# fragment hash60_sql() below.
def hash60(col, seed: int | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    payload = c if seed is None else F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str, seed: int | None = None) -> str:
    payload = expr if seed is None else f"'{seed}|' || {expr}"
    return f"(('0x'||substr(md5({payload}),1,15))::BIGINT)"


def shingles_from_tokens(tok_col, n: int = 3) -> Column:
    """Positional n-token shingles (distinct) from a MATERIALIZED token
    array column. Keep the token array a real column — expressions
    inside transform() lambdas are re-evaluated per element, so passing
    tokens(text) directly re-runs split() O(len) times per row."""
    t = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    idx = F.sequence(F.lit(0), F.size(t) - n)
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )
    return F.when(F.size(t) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def exploded_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """id, sh rows: tokenize once into a column, then explode shingles."""
    return (
        df.withColumn("_toks", tokens(text_col))
        .select(F.col(id_col), F.explode(shingles_from_tokens("_toks", n)).alias("sh"))
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on md5(text): one surviving row (min id) per digest,
    with the copy count. groupBy on the digest — single shuffle."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# Carter-Wegman double hashing: ONE md5 per shingle yields two 30-bit
# integers (h1 from hex[0:8], h2 from hex[9:17], forced odd); the i-th
# hash is (h1 + i*h2) mod 2^30. 30-bit space keeps i*h2 far from int64
# overflow in every engine. 16x fewer md5 evaluations than seeded-md5.
MINHASH_MOD = 1 << 30


def cw_hash_pair(col) -> tuple[Column, Column]:
    c = F.col(col) if isinstance(col, str) else col
    digest = F.md5(c)
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % MINHASH_MOD
    h2 = (
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("bigint") % MINHASH_MOD
    ).bitwiseOR(F.lit(1))
    return h1, h2


def cw_hash_pair_sql(expr: str) -> tuple[str, str]:
    d = f"md5({expr})"
    h1 = f"((('0x'||substr({d},1,8))::BIGINT) % {MINHASH_MOD})"
    h2 = f"(((('0x'||substr({d},9,8))::BIGINT) % {MINHASH_MOD}) | 1)"
    return h1, h2


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: explode distinct shingles, take
    ``num_hashes`` min-aggregates of double-hashed values. Output:
    id, mh_0..mh_{k-1}. Docs shorter than ``shingle_n`` are dropped."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n)
    h1, h2 = cw_hash_pair(F.col("sh"))
    sh = sh.select(F.col(id_col), h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min((F.col("h1") + s * F.col("h2")) % MINHASH_MOD).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature (``bands`` bands of ``num_hashes/bands``
    rows), hash each band, and self-join per (band, band_hash) bucket.
    Returns distinct candidate pairs (id_a < id_b)."""
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}); trailing "
            "signature rows would otherwise be silently dropped from banding"
        )
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[p.cast("string") for p in parts])).alias("bh"),
            )
        )
    buckets = sig_df.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 60) -> DataFrame:
    """60-bit SimHash over unigram tokens: per-bit signed vote of token
    hashes, majority -> bit set. One explode + one agg with ``bits``
    expressions — no 60x row blowup."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", hash60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    sim = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"s_{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
        range(bits),
        F.lit(0).cast("bigint"),
    )
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming,
    found via a banded self-join (the multi-probe search round 1
    deferred): split the ``bits``-bit fingerprint into ``bands`` equal
    bit-bands; by pigeonhole, any pair within hamming distance
    ``< bands`` agrees EXACTLY on at least one band, so candidates are
    pairs colliding on >= 1 (band, band_value) bucket — never all
    pairs. The exact hamming check (bit_count of xor) then verifies.

    Scale: one explode to ``bands`` rows per doc, a bucket equi-join,
    and a cheap verify on the 64-bit fingerprints already in hand —
    the same shape as MinHash LSH banding. Requires
    ``bands > max_hamming`` (else the pigeonhole guarantee breaks) and
    ``bands | bits``.
    """
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) for the "
            "pigeonhole guarantee (distance d can touch at most d bands)"
        )
    if bits % bands:
        raise ValueError(f"bands ({bands}) must divide bits ({bits})")
    width = bits // bands
    mask = (1 << width) - 1
    sig = simhash(df, text_col, id_col, bits=bits)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("val"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.val").alias("val"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.where(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold, via an
    inverted-index self-join (only pairs sharing >= 1 shingle are ever
    materialized)."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
