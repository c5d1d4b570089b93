"""Unit tests for the corpus-curation additions: the composed
filter_pipeline gate (each rule provoked by a literal doc), corpus-
frequency rarity (hand-computed), incremental near-dup (batch vs
corpus), and sharded export (file-count caps verified on disk)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.operators.corpus import doc_rarity
from py_etl_pipeline_woocommerce_spark.operators.dedup import dedup_incremental_near
from py_etl_pipeline_woocommerce_spark.operators.maintenance import export_shards
from py_etl_pipeline_woocommerce_spark.operators.textstats import filter_pipeline


def _doc(i, text, lang="en", source="s"):
    return (i, text, lang, source)


DOC_SCHEMA = "doc_id bigint, text string, lang string, source string"


def test_filter_pipeline_each_rule_fires(spark):
    filler = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    phrase = "the quick brown fox jumps over one lazy sleeping dog"
    docs = spark.createDataFrame(
        [
            _doc(1, "one two three"),  # 3 tokens
            _doc(2, "the " + "x " * 9 + filler),  # x freq 9/21 > 0.15
            _doc(3, phrase + " " + phrase),  # repeated phrase: dup trigrams
            _doc(4, filler + " kilo lima mike november oscar papa quebec "
                    "romeo sierra tango uniform"),  # no stopwords at all
            _doc(5, "the a of and " + filler + " kilo lima mike november "
                    "oscar papa quebec romeo sierra tango"),  # clean
        ],
        DOC_SCHEMA,
    )
    out = {r.doc_id: r for r in filter_pipeline(docs).collect()}
    assert out[1].reason == "too_short"
    assert out[2].reason == "repetitive_unigram"
    assert out[3].reason == "repetitive_trigram"
    assert out[4].reason == "low_stopword"
    assert out[5].reason == "kept" and out[5].keep
    assert not any(out[i].keep for i in (1, 2, 3, 4))


def test_doc_rarity_hand_computed(spark):
    docs = spark.createDataFrame(
        [_doc(1, "a b"), _doc(2, "a c"), _doc(3, "a a b")], DOC_SCHEMA
    )
    out = {r.doc_id: r for r in doc_rarity(docs).collect()}
    # df: a->3 docs, b->2, c->1; N=3
    assert (out[1].n_occ, out[1].df_sum) == (2, 5)
    assert out[1].commonness == pytest.approx(5 / 6)
    assert out[1].rarity == pytest.approx(1 / 6)
    assert (out[3].n_occ, out[3].df_sum) == (3, 8)
    assert out[3].commonness == pytest.approx(8 / 9)
    # rarest doc is the one with the only singleton term
    assert out[2].rarity == max(r.rarity for r in out.values())


def test_dedup_incremental_near_flags_batch_against_corpus(spark):
    phrase = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content about spark shuffles and parquet"
    docs = spark.createDataFrame(
        [
            _doc(1, phrase),                      # corpus
            _doc(2, other),                       # corpus
            _doc(10, phrase),                     # batch: exact near-dup of 1
            _doc(20, "nothing like the corpus at all in any shingle"),
        ],
        DOC_SCHEMA,
    )
    out = {r.doc_id: r for r in dedup_incremental_near(docs).collect()}
    assert set(out) == {10, 20}  # only the batch is annotated
    assert out[10].is_near_dup and out[10].dup_of == 1
    assert out[10].jaccard == pytest.approx(1.0)
    assert not out[20].is_near_dup and out[20].dup_of is None


def test_dedup_incremental_near_explicit_frames(spark):
    corpus = spark.createDataFrame([_doc(7, "w x y z " * 5)], DOC_SCHEMA)
    batch = spark.createDataFrame([_doc(3, "w x y z " * 5)], DOC_SCHEMA)
    out = dedup_incremental_near(batch, corpus).collect()
    assert len(out) == 1 and out[0].dup_of == 7


def test_export_shards_caps_file_size(spark, tmp_path):
    docs = spark.createDataFrame(
        [_doc(i, f"doc number {i}", "en" if i < 5 else "fr") for i in range(8)],
        DOC_SCHEMA,
    ).coalesce(1)
    dest = str(tmp_path / "shards")
    shards = export_shards(docs, dest, max_records_per_file=2)
    assert shards.get("lang=en", 0) >= 3  # 5 rows at <=2/file
    assert shards.get("lang=fr", 0) >= 2  # 3 rows
    back = spark.read.parquet(dest)
    assert back.count() == 8
    assert set(back.columns) == {"doc_id", "text", "source", "lang"}
    # every physical file respects the cap
    import glob

    for f in glob.glob(f"{dest}/lang=*/**/*.parquet", recursive=True):
        assert pq.read_metadata(f).num_rows <= 2


def test_dedup_against_stored_index(spark, sf_dir):
    """The stored-LSH-index path must (a) reproduce the incremental
    near-dup result and (b) join the corpus side with FEWER exchanges
    than recomputing it — the write-once win the docstring claims."""
    import contextlib
    import io
    import shutil

    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.dedup import (
        _band_frame,
        dedup_against_index,
        dedup_incremental_near,
        write_lsh_index,
    )
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    write_lsh_index(corpus, "t_lsh", n_buckets=4)
    try:
        got = sorted(map(tuple, dedup_against_index(batch, "t_lsh").collect()))
        want = sorted(map(tuple, dedup_incremental_near(docs).collect()))
        assert got == want

        def n_exchanges(df) -> int:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue().count("Exchange")

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            _, bands_b = _band_frame(batch, "doc_id")
            stored = spark.table("t_lsh_bands").withColumnRenamed(
                "doc_id", "dup_of"
            )
            _, recomputed = _band_frame(corpus, "dup_of")
            join_keys = ["band", "band_hash"]
            assert n_exchanges(stored.join(bands_b, join_keys)) < n_exchanges(
                recomputed.join(bands_b, join_keys)
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        drop_table(spark, "t_lsh_bands")
        drop_table(spark, "t_lsh_shingles")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_corpus_prep_composes_all_gates(spark):
    """Gate, dedup, sample, and packing compose: only clean, unique,
    in-sample docs reach the packed layout."""
    from py_etl_pipeline_woocommerce_spark.operators.corpus import corpus_prep

    clean = ("the a of and alpha bravo charlie delta echo foxtrot golf hotel "
             "india juliet kilo lima mike november oscar papa quebec")
    docs = spark.createDataFrame(
        [
            _doc(1, clean),            # kept
            _doc(2, clean),            # exact dup of 1 -> dropped
            _doc(3, "too short"),      # gate: too_short
            _doc(4, clean + " extra"), # kept (distinct content)
        ],
        DOC_SCHEMA,
    )
    out = {r.doc_id: r for r in corpus_prep(docs, sample_pct=100).collect()}
    assert set(out) == {1, 4}
    # layout invariants hold on the survivors
    for r in out.values():
        assert r.n_packs_spanned == r.end_pack - r.start_pack + 1


def test_line_index_catches_cross_batch_boilerplate(spark):
    """The stored line index must (a) catch boilerplate whose
    occurrences are split ACROSS doc-disjoint ingest batches — the
    case per-batch strip_common_lines structurally misses, (b) fold
    appended batch partials on read, and (c) keep the index-side fold
    exchange-free (the bucketed-store win the docstring claims)."""
    import contextlib
    import io
    import shutil

    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.operators.dedup import (
        compact_line_index,
        strip_against_line_index,
        strip_common_lines,
        write_line_index,
    )
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table

    footer = "copyright acme corp"
    batch1 = spark.createDataFrame(
        [(1, f"historic content one\n{footer}")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(2, f"fresh content two\n{footer}"),
         (3, "batch internal dup\nunique tail three"),
         (4, "batch internal dup\nunique tail four")],
        "doc_id long, text string",
    )
    write_line_index(batch1, "t_li", n_buckets=4)
    try:
        # footer appears ONCE per batch: per-batch strip keeps it...
        per_batch = {
            r.doc_id: r.clean_text
            for r in strip_common_lines(batch2, min_df=2).collect()
        }
        assert footer in per_batch[2]
        # ...the index strip drops it (stored df 1 + batch df 1 >= 2)
        # and still catches the batch-INTERNAL duplicate line
        out = {
            r.doc_id: r
            for r in strip_against_line_index(
                batch2, "t_li", min_df=2
            ).collect()
        }
        assert out[2].clean_text == "fresh content two"
        assert out[2].n_lines_removed == 1
        assert out[3].clean_text == "unique tail three"
        assert out[4].clean_text == "unique tail four"

        # default mode is APPEND (an accidental overwrite would reset
        # every historic count): after staging batch2, partials fold
        # on read and both repeated lines cross min_df=2
        write_line_index(batch2, "t_li", n_buckets=4)
        stored = (
            spark.table("t_li_lines")
            .groupBy("line_hash")
            .agg(F.sum("doc_freq").alias("df"))
            .filter(F.col("df") >= 2)
        )
        assert stored.count() == 2  # footer (1+1) and the internal dup

        # compaction folds the appended partials to one row per line
        # with identical totals
        n_partials = spark.table("t_li_lines").count()
        compact_line_index(spark, "t_li", n_buckets=4)
        compacted = spark.table("t_li_lines")
        assert compacted.count() < n_partials
        assert compacted.groupBy("line_hash").count().filter(
            F.col("count") > 1
        ).count() == 0
        assert compacted.filter(F.col("doc_freq") >= 2).count() == 2

        # the exchange-free store-side fold must hold in the
        # OPERATOR'S OWN plan, not just a hand-built fold: against an
        # unbucketed copy of the same index the strip plans strictly
        # more exchanges
        def n_exchanges(df) -> int:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue().count("Exchange")

        spark.table("t_li_lines").write.mode("overwrite").saveAsTable(
            "t_plain_lines"
        )
        bucketed_plan = strip_against_line_index(batch2, "t_li", min_df=2)
        plain_plan = strip_against_line_index(batch2, "t_plain", min_df=2)
        assert n_exchanges(bucketed_plan) < n_exchanges(plain_plan)
    finally:
        drop_table(spark, "t_li_lines")
        drop_table(spark, "t_plain_lines")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_line_index_replayed_batch_id_is_noop(spark):
    """At-least-once replay safety (the rollup store's marker device
    ported to the line index): re-delivering a micro-batch with the
    same batch_id must not double-count doc_freq; markers survive
    compaction; an overwrite rebuild resets the marker set."""
    import shutil

    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.operators.dedup import (
        compact_line_index,
        write_line_index,
    )
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table

    batch1 = spark.createDataFrame(
        [(1, "alpha\nfooter"), (2, "beta\nfooter")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(3, "gamma\nfooter")], "doc_id long, text string"
    )

    def store_counts() -> dict:
        return {
            r["line_hash"]: (r["df"], r["occ"])
            for r in spark.table("t_replay_lines")
            .groupBy("line_hash")
            .agg(
                F.sum("doc_freq").alias("df"),
                F.sum("n_occurrences").alias("occ"),
            )
            .collect()
        }

    try:
        write_line_index(batch1, "t_replay", n_buckets=4, batch_id=0)
        after_b1 = store_counts()
        # re-delivered batch 0 is a no-op
        write_line_index(batch1, "t_replay", n_buckets=4, batch_id=0)
        assert store_counts() == after_b1
        # a NEW batch id folds normally
        write_line_index(batch2, "t_replay", n_buckets=4, batch_id=1)
        after_b2 = store_counts()
        assert after_b2 != after_b1
        footer = [
            k for k, (df, _) in after_b2.items() if df == 3
        ]
        assert len(footer) == 1  # footer seen in docs 1, 2, 3
        # replay of batch 1 after the fold: still a no-op
        write_line_index(batch2, "t_replay", n_buckets=4, batch_id=1)
        assert store_counts() == after_b2
        # markers SURVIVE compaction — a compacted batch is applied
        compact_line_index(spark, "t_replay", n_buckets=4)
        assert store_counts() == after_b2
        write_line_index(batch2, "t_replay", n_buckets=4, batch_id=1)
        assert store_counts() == after_b2
        # an overwrite rebuild clears markers: old ids apply again
        write_line_index(batch1, "t_replay", n_buckets=4, mode="overwrite")
        assert store_counts() == after_b1
        write_line_index(batch2, "t_replay", n_buckets=4, batch_id=1)
        assert store_counts() == after_b2
        # dropping the table and rebuilding BY APPENDS (a fresh stream
        # with batch ids restarting at 0) must not skip batches whose
        # id was used by the previous incarnation — the first append
        # to a fresh table resets the stale marker set
        drop_table(spark, "t_replay_lines")
        write_line_index(batch1, "t_replay", n_buckets=4, batch_id=0)
        assert store_counts() == after_b1
        write_line_index(batch2, "t_replay", n_buckets=4, batch_id=1)
        assert store_counts() == after_b2
    finally:
        drop_table(spark, "t_replay_lines")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_line_index_staged_commit_survives_both_crash_windows(
    spark, monkeypatch
):
    """Line-index twin of the rollup store's staged-commit test: a
    crash on either side of the marker leaves doc_freq either fully
    applied + marked or fully untouched, and replay lands the batch
    exactly once — including for the FIRST batch, which now also runs
    through staging (against an empty pre-created table)."""
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.functions import fsutil
    from py_etl_pipeline_woocommerce_spark.operators import dedup as dd
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table

    batch1 = spark.createDataFrame(
        [(1, "alpha\nfooter"), (2, "beta\nfooter")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(3, "gamma\nfooter")], "doc_id long, text string"
    )

    def store_counts() -> dict:
        return {
            r["line_hash"]: (r["df"], r["occ"])
            for r in spark.table("t_crash_lines")
            .groupBy("line_hash")
            .agg(
                F.sum("doc_freq").alias("df"),
                F.sum("n_occurrences").alias("occ"),
            )
            .collect()
        }

    real_touch = fsutil.fs_touch

    def crash_on_marker(spark_, uri):
        if uri.endswith("_applied/batch-0"):
            raise RuntimeError("injected crash before marker")
        return real_touch(spark_, uri)

    try:
        # WINDOW A on the FIRST batch: staged but unmarked — the store
        # exists (created empty) and holds nothing; replay applies once
        monkeypatch.setattr(fsutil, "fs_touch", crash_on_marker)
        with _pytest.raises(RuntimeError, match="injected"):
            dd.write_line_index(batch1, "t_crash", n_buckets=4, batch_id=0)
        monkeypatch.setattr(fsutil, "fs_touch", real_touch)
        assert store_counts() == {}  # fully absent
        dd.write_line_index(batch1, "t_crash", n_buckets=4, batch_id=0)
        after_b1 = store_counts()
        assert sorted(df for df, _ in after_b1.values()) == [1, 1, 2]
        dd.write_line_index(batch1, "t_crash", n_buckets=4, batch_id=0)
        assert store_counts() == after_b1  # exactly once

        # WINDOW B: marker written, promotion crashed — replay
        # completes it, still exactly once
        real_promote = dd._promote_staged_bucket_files
        monkeypatch.setattr(
            dd,
            "_promote_staged_bucket_files",
            lambda *a: (_ for _ in ()).throw(
                RuntimeError("injected crash before promotion")
            ),
        )
        with _pytest.raises(RuntimeError, match="injected"):
            dd.write_line_index(batch2, "t_crash", n_buckets=4, batch_id=1)
        monkeypatch.setattr(
            dd, "_promote_staged_bucket_files", real_promote
        )
        assert store_counts() == after_b1  # marked but not promoted
        dd.write_line_index(batch2, "t_crash", n_buckets=4, batch_id=1)
        after_b2 = store_counts()
        footer = [k for k, (df, _) in after_b2.items() if df == 3]
        assert len(footer) == 1  # footer counted once per doc, 3 docs
        dd.write_line_index(batch2, "t_crash", n_buckets=4, batch_id=1)
        assert store_counts() == after_b2
        # staging directory fully cleaned up
        staged = dd._line_index_staged_dir(spark, "t_crash", 1).rsplit(
            "/batch-", 1
        )[0]
        assert fsutil.fs_list_names(spark, staged) == []
    finally:
        drop_table(spark, "t_crash_lines")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_line_index_staged_append_rejects_bucket_mismatch(spark):
    """The staged file-promotion path must keep the loud bucket-spec
    validation the direct saveAsTable append had: renaming files
    bucketed mod 16 into a mod-32 table would silently corrupt every
    exchange-free read against the store."""
    import shutil

    import pytest as _pytest

    from py_etl_pipeline_woocommerce_spark.operators.dedup import (
        write_line_index,
    )
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table

    batch = spark.createDataFrame(
        [(1, "alpha\nfooter")], "doc_id long, text string"
    )
    try:
        write_line_index(batch, "t_bmismatch", n_buckets=4, batch_id=0)
        with _pytest.raises(ValueError, match="does not match"):
            write_line_index(batch, "t_bmismatch", n_buckets=8, batch_id=1)
        # an overwrite rebuild MAY change the bucket count
        write_line_index(batch, "t_bmismatch", n_buckets=8, mode="overwrite")
        write_line_index(batch, "t_bmismatch", n_buckets=8, batch_id=0)
    finally:
        drop_table(spark, "t_bmismatch_lines")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
