"""Iterative BPE trainer/segmenter: pinned-semantics unit tests, a
hand-computed literal example, Spark-vs-pure-Python parity, and the
out-of-vocabulary segmentation contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.operators import bpe


def test_apply_merge_py_nonoverlap_greedy():
    # overlapping run: greedy merges even offsets only
    assert bpe.apply_merge_py(list("aaa"), "a", "a") == ["aa", "a"]
    assert bpe.apply_merge_py(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert bpe.apply_merge_py(list("aaaaa"), "a", "a") == ["aa", "aa", "a"]
    # non-adjacent matches both merge
    assert bpe.apply_merge_py(list("abab"), "a", "b") == ["ab", "ab"]
    # the merged symbol is NOT re-considered for the same merge
    assert bpe.apply_merge_py(["aa", "a", "a"], "aa", "a") == ["aaa", "a"]


def test_train_merges_py_hand_example():
    # Sennrich et al.'s canonical shape: {low:5, lower:2, newest:6,
    # widest:3} — first merges are (e,s) 9, then (es,t) 9.
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges, vocab = bpe.train_merges_py(wc, 3)
    assert merges[0] == (1, "e", "s", 9)
    assert merges[1] == (2, "es", "t", 9)
    # third merge: lo appears in low(5)+lower(2)=7; est+w? pairs:
    # (l,o)=7, (o,w)=7+... low:[l,o,w] gives (l,o),(o,w); lower adds
    # (o,w),(w,e),(e,r); newest [n,e,w,est]; widest [w,i,d,est].
    # (o,w) count = 5+2 = 7, (l,o) = 7 — tie broken lexicographically
    # to (l,o).
    assert merges[2][1:3] == ("l", "o")
    assert vocab["newest"] == ["n", "e", "w", "est"]


def test_train_stops_when_no_pairs():
    merges, vocab = bpe.train_merges_py([("a", 10), ("b", 3)], 5)
    assert merges == []
    assert vocab == {"a": ["a"], "b": ["b"]}


def test_spark_train_matches_python(spark, sf_dir):
    docs = bpe  # silence lints
    documents = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    got = sorted(
        tuple(r)
        for r in bpe.bpe_train(documents, n_merges=10).collect()
    )
    wc = [
        (r["token"], int(r["tok_count"]))
        for r in bpe.vocab_counts(documents).collect()
    ]
    exp, _ = bpe.train_merges_py(wc, 10)
    assert got == sorted(exp)


def test_segment_tokens_matches_python_apply(spark):
    # includes an out-of-vocabulary token: the fold replays merges on
    # any token, trained or not
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    toks = ["lowest", "low", "slowest", "test", "a", "", "zzz"]
    tdf = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        r["token"]: (list(r["symbols"]), r["n_symbols"])
        for r in bpe.segment_tokens(tdf, merges).collect()
    }
    for t in toks:
        syms = list(t)
        for l, r in merges:
            syms = bpe.apply_merge_py(syms, l, r)
        assert got[t] == (syms, len(syms)), t
    # staging boundary: same result with a different stage size
    got2 = {
        r["token"]: list(r["symbols"])
        for r in bpe.segment_tokens(tdf, merges, stage_every=1).collect()
    }
    assert {t: s for t, (s, _) in got.items()} == got2


def test_bpe_token_count_contract(spark):
    documents = spark.createDataFrame(
        [
            (1, "low low lower lowest"),
            (2, "newest, NEWEST!  widest"),
            (3, None),
            (4, ""),
            (5, "   "),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"])
        for r in bpe.bpe_token_count(documents, n_merges=4).collect()
    }
    # empty/NULL/whitespace-only text: 0/0, row present (the
    # token_count contract)
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)
    assert out[5] == (0, 0)
    # normalization folds case/punctuation before training
    assert out[2][0] == 3
    # BPE token count is bounded below by ws tokens? No — above:
    # every token is >= 1 symbol, <= its char length
    for did in (1, 2):
        ws, bp = out[did]
        assert bp >= ws


def test_bpe_train_vocab_cut_deterministic(spark, sf_dir):
    documents = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    a = [tuple(r) for r in bpe.bpe_train(documents, 6, max_vocab_words=50).collect()]
    b = [tuple(r) for r in bpe.bpe_train(documents, 6, max_vocab_words=50).collect()]
    assert a == b
    # the cut changes counts (fewer words contribute) but stays valid
    assert all(m[3] > 0 for m in a)
    # the r11 default cap (DEFAULT_MAX_VOCAB_WORDS = 1M) bounds the
    # driver collect BY DEFAULT; on a sub-cap vocabulary it must be
    # bit-identical to the exact full-vocabulary opt-in (None)
    assert bpe.DEFAULT_MAX_VOCAB_WORDS == 1_000_000
    capped = [tuple(r) for r in bpe.bpe_train(documents, 6).collect()]
    exact = [
        tuple(r)
        for r in bpe.bpe_train(documents, 6, max_vocab_words=None).collect()
    ]
    assert capped == exact


def test_bpe_train_truncation_is_loud(spark, sf_dir):
    """The r11 ADVICE item: a cap that actually drops vocabulary must
    WARN (merge ranks are approximate under truncation — dropped-tail
    pair counts stop participating), and a cap the vocabulary fits
    under must stay silent. The module logger sets propagate=False,
    so capture with a handler on it directly."""
    import logging

    documents = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    records: list[logging.LogRecord] = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    h = _Capture(level=logging.WARNING)
    bpe._LOG.addHandler(h)
    try:
        bpe.bpe_train(documents, 2, max_vocab_words=10).collect()
        assert any(
            "APPROXIMATE under truncation" in r.getMessage() for r in records
        )
        records.clear()
        bpe.bpe_train(documents, 2, max_vocab_words=10_000_000).collect()
        assert not records
    finally:
        bpe._LOG.removeHandler(h)


def test_segment_plan_stays_jvm(spark):
    # no BatchEvalPython / ArrowEvalPython anywhere in the segmenter
    merges = [("e", "s"), ("es", "t")]
    tdf = spark.createDataFrame([("test",)], "token string")
    plan = (
        bpe.segment_tokens(tdf, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_token_count_bpe_mode(spark):
    from py_etl_pipeline_woocommerce_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, None)],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_tokens_bpe"])
        for r in textstats.token_count(docs, mode="bpe").collect()
    }
    assert out[2] == (0, 0)
    ws, bp = out[1]
    assert ws == 3 and bp >= ws
    # default output unchanged
    assert "n_tokens_bpe" not in textstats.token_count(docs).columns
    import pytest

    with pytest.raises(ValueError, match="mode"):
        textstats.token_count(docs, mode="chars")


def test_oracle_matches_engine_when_merges_exhaust(spark):
    """Vocabulary exhausts its pairs before round 8: the engine's
    trainer breaks early; the oracle's LEFT JOIN must pass the
    vocabulary through empty merge rounds instead of annihilating it
    (a cross join returned 0 rows for every later round)."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'ab ab ab'), (2, 'ab cd')) t(doc_id, text)"
    )
    docs = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ab cd")], "doc_id bigint, text string"
    )
    from py_etl_pipeline_woocommerce_spark.operators import bpe

    eng = sorted(tuple(r) for r in bpe.bpe_train(docs, n_merges=8).collect())
    ora = sorted(
        tuple(r)
        for r in con.execute(entry._bpe_merge_table_sql(8))
        .df()
        .itertuples(index=False)
    )
    assert eng == ora
    assert len(eng) < 8  # the exhaustion actually happened
    tc_eng = {
        r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"])
        for r in bpe.bpe_token_count(docs, n_merges=8).collect()
    }
    tc_ora = {
        int(r.doc_id): (int(r.n_tokens_ws), int(r.n_tokens_bpe))
        for r in con.execute(entry._bpe_token_count_sql(8))
        .df()
        .itertuples(index=False)
    }
    assert tc_eng == tc_ora


def test_arrow_segmenter_matches_fold_chain(spark):
    """Above FOLD_CHAIN_MAX_MERGES segmentation switches to the Arrow
    kernel; both engines must agree symbol-for-symbol — including the
    rank-priority encode equaling in-order merge replay."""
    from py_etl_pipeline_woocommerce_spark.operators.bpe import (
        _segment_tokens_arrow,
        segment_tokens,
    )

    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
              ("a", "a"), ("n", "e")]
    toks = ["lowest", "slowest", "aaaa", "nest", "zzz", "a", "ne"]
    tdf = spark.createDataFrame([(t,) for t in toks], "token string")
    jvm = {
        r["token"]: (list(r["symbols"]), r["n_symbols"])
        for r in segment_tokens(tdf, merges).collect()
    }
    arrow = {
        r["token"]: (list(r["symbols"]), r["n_symbols"])
        for r in _segment_tokens_arrow(tdf, merges).collect()
    }
    assert jvm == arrow
    # and the auto-switch at a large merge table produces a Python
    # plan, while the small table stays JVM
    import py_etl_pipeline_woocommerce_spark.operators.bpe as bpe_mod

    big = merges * 20  # 120 > FOLD_CHAIN_MAX_MERGES (dup pairs: the
    # later duplicates never win the rank race, semantics unchanged)
    plan = (
        segment_tokens(tdf, big)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" in plan or "MapInPandas" in plan
