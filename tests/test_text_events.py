"""Text analysis + event operators: known-answer unit cases."""

from __future__ import annotations

from py_etl_pipeline_woocommerce_spark.operators.events import (
    event_window_agg,
    parse_event_props,
)
from py_etl_pipeline_woocommerce_spark.operators.sessionize import sessionize
from py_etl_pipeline_woocommerce_spark.operators.textstats import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_token_count_normalizes_punctuation(spark):
    docs = _docs(spark, [(1, "en", "Hello,   World! Foo."), (2, "en", "")])
    got = {r["doc_id"]: (r["n_tokens"], r["n_chars"]) for r in token_count(docs).collect()}
    assert got[1] == (3, 20)
    assert got[2] == (0, 0)


def test_quality_score_ranges(spark):
    docs = _docs(
        spark,
        [(1, "en", "the cat sat on the mat and the dog ran"), (2, "en", "a a a a a a")],
    )
    got = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0.0 < got[1]["quality"] <= 1.0
    # repetitive doc has lower distinct ratio
    assert got[2]["distinct_ratio"] < got[1]["distinct_ratio"]


def test_lang_id_marker_argmax(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "the cat and the dog"),
            (2, "fr", "le chat et la souris"),
            (3, "de", "der hund und die katze"),
            (4, "zz", "xyzzy plugh"),
        ],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "unknown"}


def test_doc_fingerprint_stable_across_formatting(spark):
    docs = _docs(spark, [(1, "en", "Hello, World!"), (2, "en", "hello   world")])
    fps = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs).collect()}
    assert fps[1] == fps[2]


def _events(spark, rows):
    # ts is epoch-ns BIGINT exactly like the nanosAsLong parquet read
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    )


NS = 1_000_000_000


def test_parse_event_props_extracts_k(spark):
    ev = _events(spark, [(1, 5 * NS, 7, "click", 1.5, '{"k": 42}')])
    row = parse_event_props(ev).first()
    assert row["prop_k"] == 42 and row["ts_us"] == 5_000_000


def test_event_window_agg_hour_buckets(spark):
    ev = _events(
        spark,
        [
            (1, 10 * NS, 1, "click", 1.0, "{}"),
            (2, 3599 * NS, 1, "click", 2.0, "{}"),
            (3, 3601 * NS, 1, "click", 4.0, "{}"),
        ],
    )
    got = {r["window_start_us"]: (r["n_events"], r["total_value"]) for r in event_window_agg(ev).collect()}
    assert got == {0: (2, 3.0), 3_600_000_000: (1, 4.0)}


def test_sessionize_gap_splits(spark):
    ev = _events(
        spark,
        [
            (1, 0 * NS, 1, "a", 1.0, "{}"),
            (2, 60 * NS, 1, "a", 2.0, "{}"),          # same session (1 min)
            (3, 60 * NS + 31 * 60 * NS, 1, "a", 3.0, "{}"),  # 31 min gap -> new
            (4, 0 * NS, 2, "a", 5.0, "{}"),           # other user
        ],
    )
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["total_value"])
        for r in sessionize(ev).collect()
    }
    assert got == {(1, 1): (2, 3.0), (1, 2): (1, 3.0), (2, 1): (1, 5.0)}


def test_pii_scrub_redacts_and_counts(spark):
    from py_etl_pipeline_woocommerce_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.com or call +30 210 1234567 ok", "en", "s", 0),
            (2, "card 4111 1111 1111 1111 expires soon", "en", "s", 0),
            (3, "nothing sensitive here", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert "<EMAIL>" in out[1]["text_scrubbed"]
    assert "<PHONE>" in out[1]["text_scrubbed"]
    assert "jo.doe" not in out[1]["text_scrubbed"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "<CARD>" in out[2]["text_scrubbed"] and out[2]["n_card"] == 1
    assert out[3]["text_scrubbed"] == "nothing sensitive here"
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_card"] == 0


def test_pii_scrub_redacts_ip_addresses(spark):
    from py_etl_pipeline_woocommerce_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [(1, "server at 10.0.0.1 and 192.168.1.200 up", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = pii_scrub(docs).collect()[0]
    assert r["n_ip"] == 2
    assert "<IP>" in r["text_scrubbed"] and "10.0.0.1" not in r["text_scrubbed"]


def test_chunk_documents_overlapping_windows(spark):
    from py_etl_pipeline_woocommerce_spark.operators.packing import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks), "en", "s", 0), (2, "short doc", "en", "s", 0),
         (3, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = chunk_documents(docs, max_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # ceil((10-4)/3)+1 = 3 chunks at starts 0, 3, 6
    assert [(r.token_start, r.n_tokens) for r in c1] == [(0, 4), (3, 4), (6, 4)]
    assert c1[0].chunk_text == "t0 t1 t2 t3"
    assert c1[1].chunk_text == "t3 t4 t5 t6"     # 1-token overlap
    assert c1[2].chunk_text == "t6 t7 t8 t9"
    # every token appears in some chunk
    covered = {t for r in c1 for t in r.chunk_text.split()}
    assert covered == set(toks)
    assert [(r.chunk_id, r.chunk_text) for r in by_doc[2]] == [(0, "short doc")]
    assert 3 not in by_doc  # empty doc yields no chunks


def test_linear_attribution_splits_value_across_touches(spark):
    from py_etl_pipeline_woocommerce_spark.operators.events import (
        linear_attribution,
    )

    M = 60 * 1_000_000  # one minute in µs
    rows = [
        # user 1: view + click inside window, purchase 90 -> 45 each
        (1, 0 * M, 1, "view", 0.0),
        (2, 1 * M, 1, "click", 0.0),
        (3, 2 * M, 1, "purchase", 90.0),
        # user 2: no touches -> direct gets the full 50
        (4, 5 * M, 2, "purchase", 50.0),
        # user 3: touch AFTER purchase does not count
        (5, 7 * M, 3, "purchase", 10.0),
        (6, 8 * M, 3, "view", 0.0),
    ]
    ev = spark.createDataFrame(
        [(i, t * 1000, u, ty, v, "{}") for i, t, u, ty, v in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    out = {r.channel: r for r in linear_attribution(ev).collect()}
    assert out["view"].attributed_value == 45.0
    assert out["click"].attributed_value == 45.0
    assert out["direct"].attributed_value == 60.0   # users 2 and 3
    assert out["direct"].n_conversions == 2
    # conservation: attributed mass equals total purchase value
    assert sum(r.attributed_value for r in out.values()) == 150.0


def test_session_stats_bounce_and_entry_semantics(spark):
    from py_etl_pipeline_woocommerce_spark.operators.sessionize import (
        session_stats,
    )

    M = 60 * 1_000_000
    rows = [
        # user 1, session 1: view -> click (entry view, 2 events, 5 min)
        (1, 0 * M, 1, "view", 0.0),
        (2, 5 * M, 1, "click", 0.0),
        # user 1, session 2 (>30 min later): lone purchase = bounce
        (3, 60 * M, 1, "purchase", 1.0),
        # user 2: lone view = bounce (entry view)
        (4, 0 * M, 2, "view", 0.0),
    ]
    ev = spark.createDataFrame(
        [(i, t * 1000, u, ty, v, "{}") for i, t, u, ty, v in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    out = {r.entry_type: r for r in session_stats(ev).collect()}
    v = out["view"]
    assert v.n_sessions == 2 and v.n_bounces == 1 and v.bounce_rate == 0.5
    assert v.mean_events == 1.5 and v.mean_duration_us == (5 * M) / 2
    p = out["purchase"]
    assert p.n_sessions == 1 and p.bounce_rate == 1.0 and p.mean_duration_us == 0.0
