"""Context-window sequence packing: assign documents to fixed-length
token windows, the last preprocessing step before a training feed.

Semantics (deterministic, engine-independent): documents are split
into ``n_streams`` independent streams by ``id % n_streams``, each
stream is ordered by id and concatenated, and a document belongs to
the window its FIRST token lands in: ``bin = (cum_tokens_before) //
seq_len``. ``seq_id = stream * 2^40 + bin`` is globally unique.

Scale design (100 TB): one shuffle into ``n_streams`` sort groups;
each stream's running sum is an independent window, so parallelism is
``n_streams`` — set it to O(cluster cores). No global ordering, no
driver state, no iterative passes. A single global stream (the naive
formulation) would serialize the whole corpus through one partition.

The reference engine has no packing step; this is the standard
fixed-host-bin formulation used by training pipelines so an epoch's
window boundaries are reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from petastorm_spark.operators.text import token_count, tokens

_STREAM_SHIFT = 1 << 40  # bins per stream headroom: 2^40 windows


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    n_streams: int = 32,
) -> DataFrame:
    """Per-window packing summary: ``(seq_id, n_docs, total_tokens)``.

    ``total_tokens`` can exceed ``seq_len``: a document overflowing its
    window counts in the window its first token lands in (the
    downstream feed splits it); windows are never left sparse by
    construction.
    """
    stream = (F.col(id_col) % n_streams).alias("_stream")
    d = df.select(
        F.col(id_col), token_count(text_col).alias("_n_tokens"), stream
    )
    w = Window.partitionBy("_stream").orderBy(id_col)
    d = d.withColumn("_cum", F.sum("_n_tokens").over(w))
    seq_bin = F.expr(f"(_cum - _n_tokens) div {int(seq_len)}")
    d = d.withColumn(
        "seq_id", F.col("_stream") * _STREAM_SHIFT + seq_bin
    )
    return d.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n_tokens").cast("bigint").alias("total_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    context-window preprocessing twin of :func:`pack_sequences` for
    the chunk-per-row (RAG / embedding) layout instead of the
    packed-stream layout.

    Chunk i covers tokens ``[i*step, i*step + chunk_size)`` with
    ``step = chunk_size - overlap``; every document emits
    ``max(1, ceil((n_tokens - overlap) / step))`` chunks, so all
    tokens are covered and consecutive chunks share ``overlap``
    tokens. Output: ``(id, chunk_idx, n_tokens, chunk_hash)`` with
    ``chunk_hash = md5`` of the space-joined chunk (the cheap stand-in
    for carrying the chunk text — swap the select to emit text).

    Scale: pure map + explode, no shuffle at all; chunk fan-out is
    bounded by document length over step.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap ({overlap}) must be < chunk_size ({chunk_size})")
    step = chunk_size - overlap
    d = df.select(F.col(id_col), tokens(text_col).alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    n_chunks = F.greatest(
        F.lit(1), F.expr(f"(_n - {overlap} + {step - 1}) div {step}")
    )
    d = d.withColumn("_ci", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
    sl = F.expr(f"slice(_t, _ci * {step} + 1, {chunk_size})")
    return d.select(
        F.col(id_col),
        F.col("_ci").cast("bigint").alias("chunk_idx"),
        F.size(sl).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", sl)).alias("chunk_hash"),
    )


def pack_assignments(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    n_streams: int = 32,
) -> DataFrame:
    """Per-document assignment ``(id_col, seq_id, offset)`` — the
    materialized map a feed uses to build each training window.
    ``offset`` is the document's first-token position inside its
    stream's concatenation (so ``offset % seq_len`` is the in-window
    start)."""
    stream = (F.col(id_col) % n_streams).alias("_stream")
    d = df.select(
        F.col(id_col), token_count(text_col).alias("_n_tokens"), stream
    )
    w = Window.partitionBy("_stream").orderBy(id_col)
    d = d.withColumn("_cum", F.sum("_n_tokens").over(w))
    offset = (F.col("_cum") - F.col("_n_tokens")).alias("offset")
    seq_bin = F.expr(f"(_cum - _n_tokens) div {int(seq_len)}")
    return d.select(
        F.col(id_col),
        (F.col("_stream") * _STREAM_SHIFT + seq_bin).alias("seq_id"),
        offset.cast("bigint"),
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    boundary_mod: int = 16,
) -> DataFrame:
    """Content-defined chunking (the Rabin-fingerprint recipe at token
    granularity): a token STARTS a new chunk when its 60-bit md5 hash
    is ≡ 0 mod ``boundary_mod`` — so boundaries are decided by
    CONTENT, not position, and an insertion near the head of a
    document shifts every fixed-window chunk but leaves all
    content-defined chunks after the next boundary byte-identical.
    That stability is why storage/transfer dedup uses CDC instead of
    fixed windows; expected chunk length = ``boundary_mod`` tokens.
    Output: (id, chunk_idx, n_tokens, digest, chunk_text).

    Scale: explode with positions -> one per-document running sum
    (window keyed by the id: parallelism = documents, state = one
    counter) -> one groupBy(id, chunk). All JVM expressions; chunk
    reassembly sorts each chunk's (pos, token) pairs, never the
    document."""
    from pyspark.sql import Window

    from petastorm_spark.operators.dedup import hash60
    from petastorm_spark.operators.text import tokens

    t = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    ).withColumn(
        "_b", (hash60(F.col("tok")) % boundary_mod == 0).cast("int")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = t.withColumn("chunk_idx", F.sum("_b").over(w))
    return (
        chunked.groupBy(id_col, "chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct("pos", "tok"))
            ).alias("_toks"),
        )
        .withColumn(
            "chunk_text",
            F.concat_ws(" ", F.transform(F.col("_toks"), lambda x: x["tok"])),
        )
        .select(
            id_col,
            "chunk_idx",
            "n_tokens",
            F.md5("chunk_text").alias("digest"),
            "chunk_text",
        )
    )


def next_event_examples(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    context_len: int = 5,
) -> DataFrame:
    """Supervised examples from behavior sequences: every length-
    ``context_len`` sliding window of a user's event-type sequence
    (ordered by (ts, id) — a total order, so deterministic) becomes a
    training row (context array, label = the next event) — the
    sequence-dataset prep for next-event / session-recommendation
    models. Output: (user, window_idx, context, label).

    Scale: ONE user-keyed shuffle; each user's sequence is assembled
    with sort_array(collect_list(struct)) — per-user event counts are
    log-bounded, the same justification as the funnel fold — and the
    window fan-out is a map-side transform + explode, never a
    self-join on position."""
    seq = (
        events.select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(id_col).alias("i"),
                F.col(type_col).alias("e"),
            ).alias("_s"),
        )
        .groupBy(user_col)
        .agg(F.array_sort(F.collect_list("_s")).alias("_seq"))
        .withColumn("_types", F.transform(F.col("_seq"), lambda s: s["e"]))
    )
    n_windows = F.size("_types") - context_len
    windows = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(0), n_windows - 1),
            lambda w: F.struct(
                w.alias("window_idx"),
                F.slice(F.col("_types"), w + 1, context_len).alias("context"),
                F.element_at(F.col("_types"), w + context_len + 1).alias(
                    "label"
                ),
            ),
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<window_idx:int,context:array<string>,label:string>>"
        )
    )
    return seq.select(user_col, F.explode(windows).alias("_w")).select(
        user_col, "_w.window_idx", "_w.context", "_w.label"
    )
