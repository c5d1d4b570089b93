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
    from .corpus import _hash_bucket  # lazy: corpus imports packing lazily too

    if budget < 1 or buckets < 1:
        # budget is interpolated into SQL: 0 would ANSI-crash mid-job
        # with an opaque div-by-zero and a NEGATIVE value would run to
        # completion emitting negative pack ids — a silently wrong
        # layout (the chunk_documents stride-guard policy)
        raise ValueError(
            f"pack_sequences: budget and buckets must be >= 1, got "
            f"budget={budget}, buckets={buckets}"
        )
    staged = documents.select(
        "doc_id",
        _hash_bucket(F.col("doc_id"), buckets),
        token_count_expr("text").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # integer `div`, not floor(double /): bigint/bigint in Spark is
    # DOUBLE, which loses low-order bits past 2^53 cumulative tokens —
    # silently wrong pack ids at exactly the stream sizes the packing
    # layout targets. Operands are non-negative, so div == floor.
    cum = staged.withColumn("_cum_end", F.sum("n_tokens").over(w))
    start_pack = F.expr(f"(_cum_end - n_tokens) div {budget}")
    end_pack = F.expr(f"(_cum_end - 1) div {budget}")
    return cum.select(
        "doc_id",
        "bucket",
        "n_tokens",
        (F.col("_cum_end") - F.col("n_tokens")).alias("stream_start"),
        start_pack.alias("start_pack"),
        end_pack.alias("end_pack"),
        ((F.col("_cum_end") - F.col("n_tokens")) % budget).alias(
            "pack_offset"
        ),
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

    ``stride`` must be in ``(0, max_tokens]``: a stride past the
    window would silently DROP the tokens between consecutive windows
    (and emit empty trailing chunks) — refused loudly instead, the
    zorder-bits style guard.
    """
    if not 0 < stride <= max_tokens:
        raise ValueError(
            f"chunk_documents: stride={stride} must be in (0, "
            f"max_tokens={max_tokens}] — a larger stride silently "
            "drops the tokens between consecutive windows"
        )
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


def pack_bins_bfd(
    documents: DataFrame, budget: int = 512, buckets: int = 8
) -> DataFrame:
    """Best-fit-decreasing bin packing: assign each document WHOLE to
    one fixed-size pack, minimizing padding — the
    no-cross-contamination packing modern LLM loaders use when
    attention must not leak across document boundaries (in contrast
    to ``pack_sequences``' concat-then-chunk layout, which splits
    docs across pack boundaries). Docs longer than ``budget`` are
    kept, alone in their pack, flagged ``truncated`` (the loader
    truncates their tail).

    Distributed shape: ONLY the (doc_id, n_tokens) metadata enters
    the packing kernel — never the text — so a bucket of a million
    docs is ~16 MB. Docs hash into ``buckets`` independent substreams
    (same determinism trick as ``pack_sequences``); each bucket's BFD
    runs in a grouped ``applyInPandas``: sort by (n_tokens desc,
    doc_id), place each doc into the open pack with the SMALLEST
    remaining capacity that fits (bisect over a sorted list; ties →
    oldest pack), else open a new pack. Honest cost: the bisect FIND
    is O(log n) but each list insert/remove is an O(open packs)
    memmove, so a bucket degenerates to O(n × open-packs) when most
    packs stay open — a heap cannot fix this (best-fit needs
    "smallest remaining ≥ size", not the global min). The knob is
    ``buckets``: kernel size is docs/buckets, so size buckets to keep
    each kernel in the low millions and the memmove constant small.
    Fully deterministic ⇒ re-runs reproduce the layout.

    Greedy set-conditioned assignment is not SQL-expressible →
    rows-only driver check; pytest asserts capacity, determinism
    under repartitioning, and strictly less padding than the naive
    in-order packer on an adversarial mix.
    """
    import pandas as pd

    from .corpus import _hash_bucket  # the canonical md5 bucket helper

    if budget < 1 or buckets < 1:
        # same loud guard as pack_sequences: a non-positive budget
        # would quietly mark EVERY doc truncated / alone-in-pack
        raise ValueError(
            f"pack_bins_bfd: budget and buckets must be >= 1, got "
            f"budget={budget}, buckets={buckets}"
        )
    staged = documents.select(
        "doc_id",
        _hash_bucket(F.col("doc_id"), buckets),
        token_count_expr("text").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    schema = (
        "doc_id bigint, bucket bigint, n_tokens bigint, pack_id bigint, "
        "pack_fill bigint, truncated boolean"
    )

    def bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        # open packs kept as a sorted list of (remaining, pack_idx);
        # best fit = first entry with remaining >= size — O(n log n)
        import bisect

        packs: list[int] = []  # pack_idx -> fill
        by_remaining: list[tuple[int, int]] = []  # sorted (remaining, idx)
        assign: list[int] = []
        truncated: list[bool] = []
        for size, _doc in zip(pdf["n_tokens"], pdf["doc_id"]):
            size = int(size)
            if size >= budget:
                packs.append(min(size, budget))
                assign.append(len(packs) - 1)
                truncated.append(size > budget)
                continue
            # smallest remaining that fits; ties -> lowest pack idx
            # (bisect on (size, -inf) finds the first remaining >= size;
            # entries with equal remaining are ordered by idx, so the
            # first hit IS the oldest such pack)
            pos = bisect.bisect_left(by_remaining, (size, -1))
            if pos < len(by_remaining):
                rem, idx = by_remaining.pop(pos)
                packs[idx] += size
                by_remaining_insert = (rem - size, idx)
                if by_remaining_insert[0] > 0:
                    bisect.insort(by_remaining, by_remaining_insert)
                assign.append(idx)
            else:
                packs.append(size)
                idx = len(packs) - 1
                # size < budget here (>= budget continued above), so
                # the new pack always has remaining capacity
                bisect.insort(by_remaining, (budget - size, idx))
                assign.append(idx)
            truncated.append(False)
        fills = [packs[i] for i in assign]
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "bucket": bucket,
                "n_tokens": pdf["n_tokens"].astype("int64"),
                "pack_id": pd.Series(assign, dtype="int64"),
                "pack_fill": pd.Series(fills, dtype="int64"),
                "truncated": pd.Series(truncated, dtype="bool"),
            }
        )

    return staged.groupBy("bucket").applyInPandas(bfd, schema)
