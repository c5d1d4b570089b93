"""Unit tests for the r2 training-data additions: repetition stats,
mix weights, sequence packing, embedding quantization — literal
hand-computed expectations plus the invariants that matter at scale
(per-bucket stream contiguity, partitioning-invariance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.catalog import load_table
from py_etl_pipeline_woocommerce_spark.operators.corpus import mix_weights
from py_etl_pipeline_woocommerce_spark.operators.packing import pack_sequences
from py_etl_pipeline_woocommerce_spark.operators.similarity import quantize_embeddings
from py_etl_pipeline_woocommerce_spark.operators.textstats import repetition_stats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a a a b", "en", "s1"),
            (2, "x y x y x y", "en", "s1"),
            (3, "le chat noir", "fr", "s2"),
            (4, "", "en", "s2"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )


def test_repetition_stats_hand_computed(docs):
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    # doc 1: tokens a,a,a,b -> top unigram 3/4; bigrams "a a","a a","a b"
    # -> top 2/3; trigrams "a a a","a a b" all distinct -> dup 0
    r1 = out[1]
    assert r1.n_tokens == 4
    assert r1.top_unigram_frac == pytest.approx(0.75)
    assert r1.top_bigram_frac == pytest.approx(2 / 3)
    assert r1.dup_trigram_frac == 0.0
    # doc 2: x y x y x y -> top unigram 3/6; bigrams xy,yx,xy,yx,xy ->
    # 3/5; trigrams xyx,yxy,xyx,yxy -> 2 dups of 4
    r2 = out[2]
    assert r2.top_unigram_frac == pytest.approx(0.5)
    assert r2.top_bigram_frac == pytest.approx(0.6)
    assert r2.dup_trigram_frac == pytest.approx(0.5)
    # empty doc keeps a row with zeroed signals
    assert out[4].n_tokens == 0 and out[4].dup_trigram_frac == 0.0


def test_mix_weights_uniform_default(docs):
    out = {r.lang: r for r in mix_weights(docs).collect()}
    # tokens: en = 4 + 6 + 0 = 10, fr = 3 -> shares 10/13, 3/13
    assert out["en"].lang_tokens == 10 and out["fr"].lang_tokens == 3
    assert out["en"].actual_share == pytest.approx(10 / 13)
    assert out["en"].target_share == pytest.approx(0.5)
    assert out["en"].mix_weight == pytest.approx(0.5 / (10 / 13))
    assert out["fr"].mix_weight == pytest.approx(0.5 / (3 / 13))


def test_mix_weights_explicit_target(docs):
    out = {r.lang: r for r in mix_weights(docs, {"fr": 0.9}).collect()}
    assert out["fr"].target_share == pytest.approx(0.9)
    # unlisted lang falls back to uniform
    assert out["en"].target_share == pytest.approx(0.5)


def test_pack_sequences_hand_computed(spark):
    # one bucket so the stream order is just doc_id order
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), "en", "s") for i, n in [(1, 3), (2, 4), (3, 2), (4, 6)]],
        "doc_id bigint, text string, lang string, source string",
    )
    out = {r.doc_id: r for r in pack_sequences(docs, budget=5, buckets=1).collect()}
    # cumulative ends: 3, 7, 9, 15 over budget 5
    assert (out[1].stream_start, out[1].start_pack, out[1].end_pack) == (0, 0, 0)
    assert (out[2].stream_start, out[2].start_pack, out[2].end_pack) == (3, 0, 1)
    assert out[2].n_packs_spanned == 2 and out[2].pack_offset == 3
    assert (out[3].stream_start, out[3].start_pack, out[3].end_pack) == (7, 1, 1)
    assert (out[4].stream_start, out[4].start_pack, out[4].end_pack) == (9, 1, 2)


def test_pack_sequences_streams_contiguous(spark, sf_dir):
    """Within every bucket the token spans tile the stream exactly:
    sorted by offset, each doc starts where the previous ended — and
    the layout is invariant to input partitioning."""
    documents = load_table(spark, sf_dir, "documents")
    out = pack_sequences(documents).orderBy("bucket", "stream_start").collect()
    pos = {}
    for r in out:
        assert r.stream_start == pos.get(r.bucket, 0)
        pos[r.bucket] = r.stream_start + r.n_tokens
    again = pack_sequences(documents.repartition(7)).orderBy(
        "bucket", "stream_start"
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_quantize_embeddings_hand_computed(spark):
    emb = spark.createDataFrame(
        [
            (0, [0.0, 10.0, 5.0], 0),
            (1, [1.0, 20.0, 5.0], 0),
            (2, [0.5, 15.0, 5.0], 1),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    # dim0 range [0,1]: codes 0,255,128(=floor(127.5+.5)); dim1 range
    # [10,20]: codes 0,255,128; dim2 constant -> scale 1.0, code 0
    assert (out[0].min_code, out[0].max_code) == (0, 0)  # vec 0 is the per-dim min
    assert (out[1].min_code, out[1].max_code) == (0, 255)
    assert (out[2].min_code, out[2].max_code) == (0, 128)
    assert out[0].n_dims == 3
    # reconstruction error bounded by half a step of the widest dim
    for r in out.values():
        assert r.max_abs_err <= 10.0 / 255 / 2 + 1e-12
    # constant dim reconstructs exactly: code 0 * scale 1 + mn == mn
    one_dim = spark.createDataFrame(
        [(0, [3.5], 0), (1, [3.5], 0)], "vec_id bigint, embedding array<float>, label int"
    )
    for r in quantize_embeddings(one_dim).collect():
        assert r.max_abs_err == 0.0 and r.max_code == 0


def test_quantize_embeddings_partitioning_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, quantize_embeddings(emb).collect()))
    b = sorted(map(tuple, quantize_embeddings(emb.repartition(13)).collect()))
    assert a == b


def test_score_embeddings_hand_computed(spark):
    from py_etl_pipeline_woocommerce_spark.operators.similarity import (
        score_embeddings,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 2.0], 0),
            (1, [0.0, 1.0, 0.0], 1),
            (2, [2.0, 2.0, 2.0], 0),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = score_embeddings(emb, weights=[1.0, -1.0, 0.5], k=2).collect()
    # margins: v0 = 1 + 0 + 1 = 2; v1 = -1; v2 = 2 - 2 + 1 = 1
    assert [(r.vec_id, r.margin, r.score_rank) for r in out] == [
        (0, 2.0, 1),
        (2, 1.0, 2),
    ]


def test_pack_sequences_tiles_under_random_inputs(spark):
    """Property: for random doc sets, every bucket stream tiles with
    no gaps/overlaps and pack spans are consistent with the budget."""
    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(["w"] * rng.randint(0, 40)), "en", "s")
        for i in range(200)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    budget = 17
    out = pack_sequences(docs, budget=budget, buckets=4).orderBy(
        "bucket", "stream_start"
    ).collect()
    pos = {}
    for r in out:
        assert r.n_tokens > 0  # empty docs excluded
        assert r.stream_start == pos.get(r.bucket, 0)  # no gap, no overlap
        pos[r.bucket] = r.stream_start + r.n_tokens
        assert r.start_pack == r.stream_start // budget
        assert r.end_pack == (r.stream_start + r.n_tokens - 1) // budget
        assert r.pack_offset == r.stream_start % budget
        assert r.n_packs_spanned == r.end_pack - r.start_pack + 1
    # all non-empty docs appear exactly once
    n_nonempty = sum(1 for _, t, _, _ in rows if t)
    assert len(out) == n_nonempty


def test_ann_quantized_matches_exact_on_coarse_data(spark):
    """On well-separated vectors the quantized ranking equals the
    exact-distance ranking, and distances are exact integers."""
    from py_etl_pipeline_woocommerce_spark.operators.similarity import (
        ann_quantized_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [10.0, 0.0], 0),
            (3, [11.0, 0.0], 0),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = ann_quantized_topk(emb, n_queries=1, k=3).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.knn_rank)] == [1, 2, 3]
    # codes over range [0,11]: scale 11/255; dists are integer code gaps
    assert all(isinstance(r.qdist, int) and r.qdist > 0 for r in out)


def test_vocab_drift_flags_shifted_terms(spark):
    from py_etl_pipeline_woocommerce_spark.operators.corpus import vocab_drift

    docs = spark.createDataFrame(
        [
            (1, "common common alpha", "en", "src0"),
            (2, "common common beta", "en", "src1"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    out = {r.term: r for r in vocab_drift(docs, "src0", "src1", k=10).collect()}
    # 'common' has equal share both sides -> zero drift, ranked last
    assert out["common"].drift == 0.0
    # alpha only in src0 (share 1/3), beta only in src1
    assert out["alpha"].share_a == pytest.approx(1 / 3)
    assert out["alpha"].share_b == 0.0 and out["alpha"].count_b == 0
    assert out["beta"].drift == pytest.approx(1 / 3)
    assert {out["alpha"].drift_rank, out["beta"].drift_rank} == {1, 2}


# ------------------------------------------------------------------
# pack_bins_bfd
# ------------------------------------------------------------------

def _bfd_docs(spark, sizes):
    # doc i gets exactly sizes[i] tokens
    return spark.createDataFrame(
        [
            (i, " ".join(f"t{j}" for j in range(n)), "en", "s")
            for i, n in enumerate(sizes)
        ],
        "doc_id bigint, text string, lang string, source string",
    )


def test_bfd_capacity_and_fill(spark):
    from py_etl_pipeline_woocommerce_spark.operators.packing import (
        pack_bins_bfd,
    )

    # budget 10: sizes 6,6,4,4 -> BFD packs (6+4) and (6+4), zero waste
    docs = _bfd_docs(spark, [6, 6, 4, 4])
    out = pack_bins_bfd(docs, budget=10, buckets=1).collect()
    assert len(out) == 4
    packs = {}
    for r in out:
        assert not r.truncated
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
        assert r.pack_fill == 10
    assert sorted(sorted(v) for v in packs.values()) == [[4, 6], [4, 6]]


def test_bfd_beats_naive_in_order_packing(spark):
    from py_etl_pipeline_woocommerce_spark.operators.packing import (
        pack_bins_bfd,
    )

    # in doc_id order (9,2,9,2,9,2) a naive first-fit-in-order packer
    # with budget 11 opens a new pack per 9 after filling (9+2); BFD
    # sorts descending and pairs every 9 with a 2: 3 packs, 0 waste
    docs = _bfd_docs(spark, [9, 2, 9, 2, 9, 2])
    out = pack_bins_bfd(docs, budget=11, buckets=1).collect()
    n_packs = len({r.pack_id for r in out})
    assert n_packs == 3
    assert all(r.pack_fill == 11 for r in out)


def test_bfd_oversize_isolated_and_truncated(spark):
    from py_etl_pipeline_woocommerce_spark.operators.packing import (
        pack_bins_bfd,
    )

    docs = _bfd_docs(spark, [20, 3, 3])
    out = {r.doc_id: r for r in pack_bins_bfd(docs, budget=10, buckets=1).collect()}
    assert out[0].truncated and out[0].pack_fill == 10
    # the oversize doc shares its pack with nobody
    assert {r.pack_id for r in out.values() if r.doc_id != 0} != {out[0].pack_id}


def test_bfd_deterministic_across_partitioning(spark):
    from py_etl_pipeline_woocommerce_spark.operators.packing import (
        pack_bins_bfd,
    )

    import numpy as np

    rng = np.random.RandomState(11)
    sizes = [int(x) for x in rng.randint(1, 400, 200)]
    docs = _bfd_docs(spark, sizes)
    a = sorted(
        (r.doc_id, r.bucket, r.pack_id)
        for r in pack_bins_bfd(docs, budget=512, buckets=4).collect()
    )
    b = sorted(
        (r.doc_id, r.bucket, r.pack_id)
        for r in pack_bins_bfd(
            docs.repartition(7), budget=512, buckets=4
        ).collect()
    )
    assert a == b
