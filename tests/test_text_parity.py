"""Cross-engine parity of the text normal form on adversarial inputs.

Every text operator's oracle comparison rides on ``norm_text`` (Spark
regexp_replace) computing the exact same string as the oracle's
``_NORM`` DuckDB expression. Regex dialect drift (anchors, unicode
classes, replacement semantics) would silently skew every dedup/
textstat oracle, so this pins the pair on strings chosen to provoke
dialect differences.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.functions.text import (
    md5_hex,
    norm_text,
    token_count_expr,
)

#: must match __spark_entry__._NORM (the oracle-side normal form)
NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)

CASES = [
    "",
    " ",
    "   leading and trailing   ",
    "UPPER lower MiXeD",
    "punct!@#$%^&*()_+-=[]{};':\",./<>?`~",
    "tabs\tand\nnewlines\r\nhere",
    "unicode: café naïve Ω ß 中文 🙂",
    "digits 123 mixed a1b2c3",
    "many     internal      spaces",
    "a",
    "already normal text",
    "dash-joined and under_scored words",
    "quotes 'single' \"double\"",
    "backslash \\ and slash /",
    "100% of $5.00 (fifty)",
]


@pytest.fixture(scope="module")
def pairs(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i int, s string")
    got = (
        df.select(
            "i",
            norm_text("s").alias("norm"),
            md5_hex(norm_text("s")).alias("h"),
            token_count_expr("s").alias("n"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(CASES)))
    want = con.execute(
        f"""
        SELECT i, {NORM_SQL} AS norm, md5({NORM_SQL}) AS h,
               CASE WHEN length({NORM_SQL}) = 0 THEN 0
                    ELSE len(string_split({NORM_SQL}, ' ')) END AS n
        FROM t ORDER BY i
        """
    ).fetchall()
    return got, want


def test_normal_form_matches_duckdb(pairs):
    got, want = pairs
    for g, w in zip(got, want):
        assert g["norm"] == w[1], f"case {g['i']}: {g['norm']!r} != {w[1]!r}"


def test_fingerprint_hash_matches_duckdb(pairs):
    got, want = pairs
    for g, w in zip(got, want):
        assert g["h"] == w[2], f"case {g['i']}"


def test_token_count_matches_duckdb(pairs):
    got, want = pairs
    for g, w in zip(got, want):
        assert g["n"] == w[3], f"case {g['i']}: {g['n']} != {w[3]}"


def test_normalize_text_canonicalizes_unicode_and_whitespace(spark):
    from py_etl_pipeline_woocommerce_spark.operators.textstats import (
        normalize_text,
    )

    rows = [
        # NFC: e + combining acute composes to the single codepoint
        (1, "café au lait"),
        # control chars stripped, space/tab runs collapse
        (2, "a\x01b\x07c  d\t\te \x7f f"),
        # spaces trimmed around newlines, 3+ newlines -> paragraph
        (3, "  lead \n  mid  \n\n\n\n tail  "),
        (4, None),
        (5, "already clean"),
        (6, ""),
        # CRLF and lone CR unify to LF BEFORE the newline rules, so
        # the CRLF and LF variants of a document normalize identically
        (7, "win\r\nline\r\r\n\r\n\r\nend\r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(df).collect()}

    assert out[1].text_norm == "café au lait" and out[1].changed
    assert out[2].text_norm == "abc d e f" and out[2].changed
    assert out[3].text_norm == "lead\nmid\n\ntail" and out[3].changed
    assert out[4].text_norm is None and not out[4].changed
    assert out[4].n_chars_norm is None
    assert out[5].text_norm == "already clean" and not out[5].changed
    assert out[6].text_norm == "" and not out[6].changed
    assert out[7].text_norm == "win\nline\n\nend" and out[7].changed

    # idempotence: normalizing the normal form is the identity
    again = normalize_text(
        spark.createDataFrame(
            [(k, r.text_norm) for k, r in out.items()],
            "doc_id long, text string",
        )
    )
    assert all(not r.changed for r in again.collect())


def test_strip_markup_extracts_text_from_html(spark):
    from py_etl_pipeline_woocommerce_spark.operators.textstats import (
        strip_markup,
    )

    html = (
        '<html><body><SCRIPT a="b">var x = 1 && 2;</script >\r\n'
        "<style>.c { color: red }</style><!-- secret -->\n"
        '<h1>Title</h1>\r\n<p class="lead">hello\nsource   wrapped</p>'
        "<ul><li>one</li><li>two</li></ul>"
        "<div>tail &lt;b&gt;not a tag&lt;/b&gt; &amp;amp; "
        "&quot;q&quot; &#39;s&nbsp;end</div></body></html>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "plain text stays"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_markup(df).collect()}

    # script (case-insensitive, spaced close tag) and style contents
    # are gone; SOURCE whitespace (CRLF wraps, mid-paragraph newlines)
    # collapses to spaces BEFORE block tags become line structure, so
    # output lines reflect BLOCK structure, never crawler wrapping and
    # never a surviving \r; adjacent closers + openers yield a
    # paragraph break capped at 2 newlines; entity-encoded pseudo-tags
    # survive as TEXT; &amp; decodes LAST (no &amp;amp; double-decode)
    assert out[1].text_clean == (
        "Title\n\nhello source wrapped\n\none\n\ntwo\n\n"
        'tail <b>not a tag</b> &amp; "q" \'s end'
    )
    assert "\r" not in out[1].text_clean
    assert out[1].n_tags == 21
    assert out[2].text_clean == "plain text stays" and out[2].n_tags == 0
    assert out[3].text_clean is None and out[3].n_tags is None
    assert out[4].text_clean == "" and out[4].n_tags == 0

    # entity decode is one-level-per-pass BY DESIGN (like any entity
    # decoder): a second pass decodes the &amp; that the first pass
    # correctly left as the text encoding of &amp;amp; — and strips
    # the <b> pseudo-tag that is now real markup. Markup-free text is
    # a fixed point:
    assert strip_markup(
        spark.createDataFrame(
            [(1, 'plain & "q" \'s end')], "doc_id long, text string"
        )
    ).collect()[0].text_clean == 'plain & "q" \'s end'


def test_extract_links_attribute_anchored_with_domains(spark):
    from py_etl_pipeline_woocommerce_spark.operators.textstats import (
        extract_links,
    )

    html = (
        '<a HREF="https://Example.COM/p?q=1#f">x</a> '
        "<img src='//cdn.ex.org/i.png'/> "
        '<a href="/relative/path">y</a> '
        '<script src="http://js.ex.org:8080/a.js"></script> '
        # apostrophe inside a double-quoted URL must NOT truncate
        '<a href="https://en.wikipedia.org/wiki/It\'s_a_Life">w</a> '
        # unquoted value (minified HTML) with an encoded query string
        "<a href=https://plain.ex.net/u?a=1&amp;b=2>u</a> "
        # userinfo is skipped for the domain (blocklist-bypass shape)
        '<a href="https://trusted.com@evil.com/p">e</a> '
        # IPv6 host stays bracketed, port excluded
        '<a href="http://[2001:db8::1]:8080/x">v</a> '
        "bare text https://not-a-link.example.com ignored"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "no links at all"), (3, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        extract_links(df).collect(), key=lambda r: (r.doc_id, r.link_pos)
    )
    got = [(r.doc_id, r.link_pos, r.url, r.domain) for r in rows]
    # attribute-anchored only (the bare URL in text is content);
    # domains lowercase; port excluded; relative -> ''; entities
    # decode in URLs so the link graph joins against real targets
    assert got == [
        (1, 0, "https://Example.COM/p?q=1#f", "example.com"),
        (1, 1, "//cdn.ex.org/i.png", "cdn.ex.org"),
        (1, 2, "/relative/path", ""),
        (1, 3, "http://js.ex.org:8080/a.js", "js.ex.org"),
        (1, 4, "https://en.wikipedia.org/wiki/It's_a_Life",
         "en.wikipedia.org"),
        (1, 5, "https://plain.ex.net/u?a=1&b=2", "plain.ex.net"),
        (1, 6, "https://trusted.com@evil.com/p", "evil.com"),
        (1, 7, "http://[2001:db8::1]:8080/x", "[2001:db8::1]"),
    ]


def test_strip_markup_unclosed_script_does_not_leak(spark):
    """A crawl-truncated page whose </script> never arrives must not
    leak its JS body into text_clean (the paired pattern needs the
    closer; the backstop drops the unclosed element to end-of-doc)."""
    from py_etl_pipeline_woocommerce_spark.operators.textstats import (
        strip_markup,
    )

    docs = spark.createDataFrame(
        [
            (1, "<p>keep me</p><script>var secret = 1; window.x("),
            (2, "<p>a</p><style>.c{color:red}</style><p>b</p>"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_clean"] for r in strip_markup(docs).collect()}
    assert got[1] == "keep me"
    assert "secret" not in got[1]
    assert got[2] == "a\n\nb"  # </p><p> = paragraph break (two \n)


def test_pii_phone_does_not_cross_lines(spark):
    """Two short digit runs on adjacent lines are NOT one phone: the
    old \\s-based run swallowed the newline and destructively merged
    unrelated numbers into one <PHONE>."""
    from py_etl_pipeline_woocommerce_spark.operators.textstats import (
        pii_scrub,
    )

    docs = spark.createDataFrame(
        [(1, "Invoice 1234\n5678 Main St"), (2, "call +30 210 123 4567 now")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_phone"] == 0
    assert "1234\n5678" in got[1]["text_scrubbed"]
    assert got[2]["n_phone"] == 1
    assert "<PHONE>" in got[2]["text_scrubbed"]


def test_lang_id_nb_ignores_null_declared_lang_in_training(spark):
    """Docs with NULL declared lang must not train a phantom class
    that out-floors every real language for OOV-heavy docs."""
    from py_etl_pipeline_woocommerce_spark.operators.textstats import (
        lang_id_nb,
    )

    rows = [(i, "the cat sat on the mat and the dog", "en") for i in range(8)]
    rows += [(100 + i, "der hund und die katze und das haus", "de") for i in range(8)]
    # unlabeled docs: must be SCORED but never trained on
    rows += [(200, "zzz qqq xxx vvv", None), (201, "the dog and the cat", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id_nb(docs).collect()}
    assert set(got.values()) <= {"en", "de"}  # no NULL/phantom class
    assert got[201] == "en"


def test_quality_score_null_text_counts_zero_tokens(spark):
    """NULL text is 0 tokens (not NULL), so filter_pipeline's audit
    reason reads too_short rather than falling through to a ratio
    rule."""
    from py_etl_pipeline_woocommerce_spark.operators.textstats import (
        filter_pipeline,
        quality_score,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "the cat sat")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[1]["n_tokens"] == 0
    f = {r["doc_id"]: r for r in filter_pipeline(docs).collect()}
    assert f[1]["reason"] == "too_short"
