"""Training-sequence packing layout over the ``documents`` table.

LLM pre-training concatenates tokenized documents and slices the
stream into fixed-length sequences ("concat-then-chunk" packing —
the layout GPT-style loaders use; documents may span a chunk
boundary). This operator computes that layout as metadata — which
pack each document starts and ends in, and at what offset — without
materializing token ids, so a loader (or a downstream `mapInPandas`
tokenizer) can shard work by pack id.

Scale shape: a single global ordered cumsum would serialize on one
partition, so the stream is first split into ``buckets`` independent
substreams by a deterministic hash of ``doc_id``; each bucket gets
its own contiguous token stream and pack numbering ``(bucket,
pack)``. One shuffle on ``bucket`` + an in-partition sort — set
``buckets`` ≈ cluster width at 100 TB and every window fits an
executor. All arithmetic is integer (BIGINT), so the layout is
bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_expr


def pack_sequences(
    documents: DataFrame, budget: int = 512, buckets: int = 8
) -> DataFrame:
    """Concat-then-chunk packing layout: per doc, its token span in the
    bucket's concatenated stream and the packs that span covers.

    Output (one row per non-empty document):
    - ``bucket`` — substream id (hash of doc_id mod ``buckets``),
    - ``n_tokens`` — document token count,
    - ``stream_start`` — 0-based token offset in the bucket stream,
    - ``start_pack`` / ``end_pack`` — first/last pack (chunk of
      ``budget`` tokens) the document lands in,
    - ``pack_offset`` — offset inside ``start_pack``,
    - ``n_packs_spanned`` — boundary crossings + 1.
    """
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
    n_tok = token_count_expr("text")
    staged = documents.select(
        "doc_id",
        (h.cast("bigint") % buckets).alias("bucket"),
        n_tok.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_end = F.sum("n_tokens").over(w)
    stream_start = (cum_end - F.col("n_tokens")).alias("stream_start")
    start_pack = F.floor((cum_end - F.col("n_tokens")) / budget)
    end_pack = F.floor((cum_end - 1) / budget)
    return staged.select(
        "doc_id",
        "bucket",
        "n_tokens",
        stream_start,
        start_pack.alias("start_pack"),
        end_pack.alias("end_pack"),
        ((cum_end - F.col("n_tokens")) % budget).alias("pack_offset"),
        (end_pack - start_pack + 1).alias("n_packs_spanned"),
    )


def chunk_documents(
    documents: DataFrame, max_tokens: int = 64, stride: int = 48
) -> DataFrame:
    """Split long documents into overlapping token-window chunks — the
    segmentation step before embedding/indexing (RAG) or fixed-window
    training. Chunk ``k`` covers tokens ``[k·stride, k·stride +
    max_tokens)``; ``stride < max_tokens`` gives ``max_tokens -
    stride`` tokens of overlap so no boundary context is lost.

    Pure map-side: tokens materialize once per doc (HOF-CSE pitfall),
    the chunk grid is a ``sequence`` + ``explode`` fan-out (bounded by
    len/stride), and each chunk's text is a JVM-side slice+join. No
    shuffle at all — the op scales with the scan.
    """
    from ..functions.text import tokens_expr

    staged = documents.select(
        "doc_id", "lang", tokens_expr("text").alias("_toks")
    ).select(
        "doc_id",
        "lang",
        "_toks",
        F.when(F.col("_toks") == F.array(F.lit("")), F.lit(0))
        .otherwise(F.size("_toks"))
        .alias("_n"),
    )
    n_chunks = F.when(
        F.col("_n") <= max_tokens, F.lit(1)
    ).otherwise(F.ceil((F.col("_n") - max_tokens) / F.lit(stride)) + 1)
    chunked = staged.filter(F.col("_n") > 0).select(
        "doc_id",
        "lang",
        "_toks",
        "_n",
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    chunk_toks = F.slice(F.col("_toks"), start + 1, max_tokens)
    return chunked.select(
        "doc_id",
        "lang",
        "chunk_id",
        start.cast("bigint").alias("token_start"),
        F.size(chunk_toks).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
    )
