"""Round-9b operator tests: readability, char_entropy, link_domains,
filter_blocked_domains, zipf_fit, ngram_novelty, curriculum_order,
embedding_outliers.

Each test pins the CONTRACT (NULL/empty policy, determinism,
known-value math) on tiny in-memory frames — the driver's DuckDB
oracle covers the full-table value parity.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.operators import (
    corpus,
    similarity,
    textstats,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t or ""))
         for i, (t, s) in enumerate(rows)]
    )


# ------------------------------------------------------------------ #
# readability
# ------------------------------------------------------------------ #


def test_readability_known_values(spark):
    docs = _docs(spark, [("The cat sat. The dog ran!", "a")])
    row = textstats.readability(docs).collect()[0]
    # tokens of normalized text: the cat sat the dog ran = 6
    assert row.n_words == 6
    # two terminal-punct runs
    assert row.n_sentences == 2
    # vowel groups: e,a,a,e,o,a -> the(1) cat(1) sat(1) the(1) dog(1) ran(1)
    assert row.n_syllables == 6
    wps, spw = 6 / 2, 6 / 6
    expected = round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    assert row.flesch == pytest.approx(expected, abs=1e-9)


def test_readability_null_empty_and_no_punct(spark):
    docs = _docs(spark, [(None, "a"), ("", "a"), ("headline no period", "a")])
    out = {r.doc_id: r for r in textstats.readability(docs).collect()}
    assert out[0].n_words == 0 and out[0].flesch is None
    assert out[1].n_words == 0 and out[1].flesch is None
    # no terminal punctuation but words present -> floored to 1 sentence
    assert out[2].n_sentences == 1 and out[2].flesch is not None


# ------------------------------------------------------------------ #
# char_entropy
# ------------------------------------------------------------------ #


def test_char_entropy_known_values(spark):
    docs = _docs(spark, [("aaaa", "a"), ("abab", "a"), (None, "a"), ("", "a")])
    out = {r.doc_id: r for r in textstats.char_entropy(docs).collect()}
    assert out[0].entropy == 0.0 and out[0].n_distinct_chars == 1
    assert out[1].entropy == 1.0 and out[1].n_distinct_chars == 2
    assert out[2].entropy is None and out[2].n_distinct_chars == 0
    assert out[3].entropy is None and out[3].n_distinct_chars == 0


def test_char_entropy_matches_counter_fold(spark):
    s = "the quick brown fox jumps over the lazy dog 0123"
    import collections

    cnt = collections.Counter(s)
    n = len(s)
    tot = 0.0
    for ch in sorted(cnt):
        tot += cnt[ch] * math.log2(cnt[ch])
    expected = round(math.log2(n) - tot / n, 6)
    docs = _docs(spark, [(s, "a")])
    row = textstats.char_entropy(docs).collect()[0]
    assert row.entropy == expected
    assert row.n_distinct_chars == len(cnt)


# ------------------------------------------------------------------ #
# link_domains / filter_blocked_domains
# ------------------------------------------------------------------ #

_LINKY = [
    ('see <a href="https://www.example.com/a">x</a> and '
     '<a href="https://ads.example.com/b">y</a> plus '
     '<img src="https://other.org/c.png">', "a"),
    ('again <a href="https://example.com/d">z</a> and relative '
     '<a href="/rel">r</a>', "b"),
    (None, "b"),
]


def test_link_domains_counts_and_share(spark):
    docs = _docs(spark, _LINKY)
    out = {r.domain: r for r in textstats.link_domains(docs).collect()}
    # www. folded into example.com; ads. kept as its own host
    assert out["example.com"].n_links == 2
    assert out["example.com"].n_docs == 2
    assert out["ads.example.com"].n_links == 1
    assert out["other.org"].n_links == 1
    total = sum(r.n_links for r in out.values())
    assert out["example.com"].link_share == pytest.approx(2 / total)
    # relative links never make a domain row
    assert "" not in out


def test_filter_blocked_domains_suffix_match(spark):
    docs = _docs(spark, _LINKY)
    kept = textstats.filter_blocked_domains(docs, ["example.com"])
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # doc 0 links www.example.com AND ads.example.com (subdomain), doc 1
    # links example.com -> both blocked; the linkless NULL doc survives
    assert ids == {2}
    # other.org blocked alone kills only doc 0
    kept2 = textstats.filter_blocked_domains(docs, ["other.org"])
    assert {r.doc_id for r in kept2.select("doc_id").collect()} == {1, 2}
    # empty blocklist is the identity
    assert textstats.filter_blocked_domains(docs, []).count() == 3


def test_filter_blocked_domains_no_substring_false_positive(spark):
    docs = _docs(spark, [('link <a href="https://notexample.com/x">n</a>', "a")])
    kept = textstats.filter_blocked_domains(docs, ["example.com"])
    # notexample.com must NOT match example.com (suffix match is on a
    # dot boundary, not a substring)
    assert kept.count() == 1


# ------------------------------------------------------------------ #
# zipf_fit
# ------------------------------------------------------------------ #


def test_zipf_fit_exact_power_law(spark):
    # counts 24/rank (24,12,8,6) at ranks 1..4 -> log2(c) =
    # log2(24) - log2(rank): exactly linear, slope -1, r2 = 1
    words = (["aa"] * 24) + (["bb"] * 12) + (["cc"] * 8) + (["dd"] * 6)
    docs = _docs(spark, [(" ".join(words), "s0")])
    row = corpus.zipf_fit(docs).collect()[0]
    assert row.source == "s0"
    assert row.n_terms == 4 and row.vocab_size == 4
    assert row.zipf_slope == pytest.approx(-1.0, abs=1e-6)
    assert row.zipf_r2 == pytest.approx(1.0, abs=1e-6)


def test_zipf_fit_degenerate_vocab_is_null(spark):
    # a single term has zero x-variance -> slope/r2 NULL, not a crash
    docs = _docs(spark, [("solo solo solo", "s0")])
    row = corpus.zipf_fit(docs).collect()[0]
    assert row.zipf_slope is None and row.zipf_r2 is None
    assert row.n_terms == 1


def test_zipf_fit_top_v_cut(spark):
    words = []
    for i in range(10):
        words += [f"w{i}"] * (10 - i)
    docs = _docs(spark, [(" ".join(words), "s0")])
    row = corpus.zipf_fit(docs, top_v=5).collect()[0]
    assert row.n_terms == 5 and row.vocab_size == 10


# ------------------------------------------------------------------ #
# ngram_novelty
# ------------------------------------------------------------------ #


def test_ngram_novelty_counts(spark):
    ref = _docs(spark, [("one two three four", "ref")])
    # grams(3) of ref: "one two three", "two three four"
    scored = _docs(
        spark,
        [
            ("one two three four", "s"),        # all grams seen -> 0.0
            ("one two three nine ten eleven", "s"),  # 1 of 4 seen
            ("tiny doc", "s"),                   # <3 tokens -> no grams
            (None, "s"),
        ],
    )
    out = {r.doc_id: r for r in corpus.ngram_novelty(scored, ref).collect()}
    assert out[0].n_grams == 2 and out[0].novelty == 0.0
    assert out[1].n_grams == 4 and out[1].n_novel == 3
    assert out[1].novelty == pytest.approx(0.75)
    assert out[2].n_grams == 0 and out[2].novelty is None
    assert out[3].n_grams == 0 and out[3].novelty is None


def test_ngram_novelty_distinct_grams_counted_once(spark):
    ref = _docs(spark, [("x y z", "ref")])
    scored = _docs(spark, [("x y z x y z x y z", "s")])
    row = corpus.ngram_novelty(scored, ref).collect()[0]
    # per-doc DISTINCT grams: the 7 sliding windows collapse to
    # {x y z, y z x, z x y} — repeated occurrences don't inflate
    assert row.n_grams == 3
    assert row.n_novel == 2  # only "x y z" is in the reference


# ------------------------------------------------------------------ #
# curriculum_order
# ------------------------------------------------------------------ #


def test_curriculum_order_interleaves_sources(spark):
    # two sources with clearly ordered quality inside each
    good = "the cat and the dog run over a hill with grace and speed " * 4
    mid = "word word word word word word word word"
    bad = "zzz zzz zzz"
    docs = _docs(
        spark,
        [(good, "a"), (mid, "a"), (bad, "a"), (good, "b"), (bad, "b")],
    )
    rows = corpus.curriculum_order(docs).orderBy("curriculum_pos").collect()
    # positions are a dense 1..n permutation
    assert [r.curriculum_pos for r in rows] == [1, 2, 3, 4, 5]
    # the first block is every source's rank-1 doc, source-alphabetical
    assert [(r.source, r.source_rank) for r in rows[:2]] == [("a", 1), ("b", 1)]
    # within a source, positions follow quality descending
    a_rows = [r for r in rows if r.source == "a"]
    assert [r.source_rank for r in a_rows] == [1, 2, 3]
    assert a_rows[0].quality >= a_rows[1].quality >= a_rows[2].quality


def test_curriculum_order_deterministic(spark):
    docs = _docs(spark, [(f"doc {i} text filler", "s%d" % (i % 3)) for i in range(12)])
    a = corpus.curriculum_order(docs).orderBy("doc_id").collect()
    b = corpus.curriculum_order(docs).orderBy("doc_id").collect()
    assert a == b


# ------------------------------------------------------------------ #
# embedding_outliers
# ------------------------------------------------------------------ #


def _embs(spark, vecs, start_id=0):
    return spark.createDataFrame(
        [
            Row(vec_id=start_id + i, embedding=[float(x) for x in v], label=0)
            for i, v in enumerate(vecs)
        ],
        "vec_id bigint, embedding array<float>, label int",
    )


def test_embedding_outliers_flags_far_point(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    cluster = rng.normal(0, 0.01, size=(20, 4))
    far = np.full((1, 4), 10.0)
    e = _embs(spark, np.vstack([cluster, far]).tolist())
    out = {r.vec_id: r for r in similarity.embedding_outliers(e, 0.95).collect()}
    assert out[20].is_outlier
    assert out[20].dist_pct_rank == 1.0
    assert sum(1 for r in out.values() if r.is_outlier) == 2  # 0.95 of 21 -> top 2
    # distances are against the grid-mean centroid
    assert out[20].dist > out[0].dist


def test_embedding_outliers_skips_malformed(spark):
    e = _embs(spark, [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    bad = spark.createDataFrame(
        [Row(vec_id=99, embedding=[float("nan"), 1.0], label=0),
         Row(vec_id=98, embedding=None, label=0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = similarity.embedding_outliers(e.unionByName(bad)).collect()
    ids = {r.vec_id for r in out}
    assert ids == {0, 1, 2}  # NaN / NULL vectors neither rank nor vote
    # zero vector is a legitimate L2 point and participates
    assert 0 in ids


def test_embedding_outliers_deterministic_centroid(spark):
    e = _embs(spark, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    a = sorted(similarity.embedding_outliers(e.repartition(1)).collect())
    b = sorted(similarity.embedding_outliers(e.repartition(7)).collect())
    assert a == b


# ------------------------------------------------------------------ #
# mojibake_score / fix_mojibake
# ------------------------------------------------------------------ #

MOJI2 = "caf\u00c3\u00a9"          # UTF-8 'caf\u00e9' read as cp1252
MOJI3 = "it\u00e2\u20ac\u2122s"   # UTF-8 right-quote read as cp1252


def test_mojibake_score_counts(spark):
    docs = _docs(
        spark,
        [
            (MOJI2 + " ok", "a"),            # one 2-byte artifact
            (MOJI3, "a"),                     # one 3-byte artifact
            ("bad \ufffd char \u0080", "a"),  # replacement + C1
            ("clean ascii text.", "a"),
            (None, "a"),
        ],
    )
    out = {r.doc_id: r for r in textstats.mojibake_score(docs).collect()}
    assert out[0].n_mojibake2 == 1 and out[0].n_mojibake3 == 0
    assert out[1].n_mojibake3 == 1 and out[1].n_mojibake2 == 0
    assert out[2].n_replacement == 1 and out[2].n_c1_controls == 1
    assert out[3].n_mojibake2 == 0 and out[3].mojibake_per_kchar == 0.0
    assert out[4].n_mojibake2 == 0 and out[4].mojibake_per_kchar is None
    # rate: 1 artifact over len(MOJI2 + ' ok') chars * 1000, round 6
    n = len(MOJI2 + " ok")
    assert out[0].mojibake_per_kchar == pytest.approx(
        round(1 / n * 1000, 6), abs=1e-9
    )


def test_fix_mojibake_repairs_and_is_idempotent(spark):
    docs = _docs(
        spark,
        [
            (MOJI2, "a"),
            (MOJI3, "a"),
            ("caf\u00e9 already clean", "a"),   # round-trip fails utf-8
            ("plain ascii", "a"),                 # round-trips to itself
            ("\u65e5\u672c", "a"),              # not byte-mappable
            (None, "a"),
        ],
    )
    out = {r.doc_id: r for r in textstats.fix_mojibake(docs).collect()}
    assert out[0].text_fixed == "caf\u00e9" and out[0].changed
    assert out[1].text_fixed == "it\u2019s" and out[1].changed
    assert out[2].text_fixed == "caf\u00e9 already clean" and not out[2].changed
    assert out[3].text_fixed == "plain ascii" and not out[3].changed
    assert out[4].text_fixed == "\u65e5\u672c" and not out[4].changed
    assert out[5].text_fixed is None and not out[5].changed
    # idempotent: a second pass changes nothing
    fixed_docs = _docs(spark, [(out[0].text_fixed, "a")])
    again = textstats.fix_mojibake(fixed_docs).collect()[0]
    assert again.text_fixed == "caf\u00e9" and not again.changed


# ------------------------------------------------------------------ #
# split_sentences
# ------------------------------------------------------------------ #


def test_split_sentences_order_and_trim(spark):
    docs = _docs(
        spark,
        [
            ("One two. Three!  Four? \t trailing", "a"),
            ("no terminal punct", "a"),
            ("...", "a"),     # only boundaries -> no sentences
            ("", "a"),
            (None, "a"),
        ],
    )
    rows = textstats.split_sentences(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.sent_pos, r.sentence))
    assert sorted(by_doc[0]) == [
        (0, "One two"), (1, "Three"), (2, "Four"), (3, "trailing")
    ]
    assert by_doc[1] == [(0, "no terminal punct")]
    assert 2 not in by_doc and 3 not in by_doc and 4 not in by_doc
    n = {r.sentence: r.n_chars_sent for r in rows if r.doc_id == 0}
    assert n["One two"] == 7


# ------------------------------------------------------------------ #
# bpe_merge_candidates
# ------------------------------------------------------------------ #


def test_bpe_merge_candidates_weighted_overlapping(spark):
    # vocab: aa x2, bb x1, aaa x1 -> pairs: 'aa' from aa (1 pair x2)
    # + from aaa (2 overlapping pairs x1) = 4; 'bb' = 1
    docs = _docs(spark, [("aa bb aa", "s"), ("aaa", "s")])
    rows = corpus.bpe_merge_candidates(docs).collect()
    by_pair = {(r.left, r.right): r for r in rows}
    assert by_pair[("a", "a")].n_occurrences == 4
    assert by_pair[("a", "a")].pair_rank == 1
    assert by_pair[("b", "b")].n_occurrences == 1
    assert by_pair[("b", "b")].pair_rank == 2


def test_bpe_merge_candidates_k_cut_and_ties(spark):
    # ab, cd, ef each once -> tie on count, rank breaks on pair text
    docs = _docs(spark, [("ab cd ef", "s")])
    rows = corpus.bpe_merge_candidates(docs, k=2).collect()
    assert [(r.left, r.right, r.pair_rank) for r in rows] == [
        ("a", "b", 1), ("c", "d", 2)
    ]


def test_fix_mojibake_artifact_gate(spark):
    # ordinary accented text (accents NOT followed by cp1252-trail
    # chars) shows no artifacts -> the gate leaves it untouched, even
    # though its cp1252 bytes would round-trip
    healthy = "caf\u00e9 au lait"
    # double-encoded mojibake peels one layer per pass and converges
    double = "\u00c3\u0192\u00c2\u00a9"  # 'é' UTF-8-encoded twice
    docs = _docs(spark, [(healthy, "a"), (double, "a")])
    out = {r.doc_id: r for r in textstats.fix_mojibake(docs).collect()}
    assert out[0].text_fixed == healthy and not out[0].changed
    assert out[1].text_fixed == "\u00c3\u00a9" and out[1].changed
    # second pass finishes the peel
    again = textstats.fix_mojibake(
        _docs(spark, [(out[1].text_fixed, "a")])
    ).collect()[0]
    assert again.text_fixed == "\u00e9" and again.changed
    # third pass: clean, untouched
    third = textstats.fix_mojibake(
        _docs(spark, [(again.text_fixed, "a")])
    ).collect()[0]
    assert third.text_fixed == "\u00e9" and not third.changed


# ------------------------------------------------------------------ #
# anchor_texts / skipgram_pairs
# ------------------------------------------------------------------ #


def test_anchor_texts_extracts_url_and_label(spark):
    docs = _docs(
        spark,
        [
            ('pre <a href="https://a.com/x">First &amp; label</a> mid '
             "<a href='https://b.com/y' rel=nofollow>  spaced\t label </a> "
             '<a href=https://c.com/z>unquoted</a> '
             '<img src="https://noanchor.com/i.png">'
             '<a href="/rel">nested <b>bold</b></a>', "a"),
            (None, "a"),
        ],
    )
    rows = textstats.anchor_texts(docs).collect()
    by_pos = {r.link_pos: r for r in rows if r.doc_id == 0}
    assert by_pos[0].url == "https://a.com/x"
    assert by_pos[0].anchor_text == "First & label"   # entity decoded
    assert by_pos[1].url == "https://b.com/y"
    assert by_pos[1].anchor_text == "spaced label"    # ws collapsed+trim
    assert by_pos[2].url == "https://c.com/z"
    assert by_pos[2].anchor_text == "unquoted"
    # img src is not an anchor; the nested-markup anchor is KEPT
    # (recall-leaning grammar) with the pre-markup prefix as label
    assert len(by_pos) == 4
    assert by_pos[3].url == "/rel" and by_pos[3].anchor_text == "nested"


def test_skipgram_pairs_window_counts(spark):
    # "a b c a b": forward pairs window=2:
    # (a,b)x2 [pos1,pos4], (a,c)x1, (b,c)x1, (b,a)x1, (c,a)x1, (c,b)x1
    docs = _docs(spark, [("a b c a b", "s")])
    rows = corpus.skipgram_pairs(docs, window=2).collect()
    got = {(r.center, r.context): r.n_pairs for r in rows}
    assert got == {
        ("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1,
        ("b", "a"): 1, ("c", "a"): 1, ("c", "b"): 1,
    }
    ranks = {(r.center, r.context): r.pair_rank for r in rows}
    assert ranks[("a", "b")] == 1  # highest count
    assert ranks[("a", "c")] == 2  # ties break on pair text


def test_skipgram_pairs_short_docs_and_k_cut(spark):
    docs = _docs(spark, [("solo", "s"), ("", "s"), (None, "s"),
                          ("x y", "s")])
    rows = corpus.skipgram_pairs(docs, window=3, k=1).collect()
    assert [(r.center, r.context, r.n_pairs) for r in rows] == [("x", "y", 1)]
