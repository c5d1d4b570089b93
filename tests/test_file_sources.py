"""CSV / JSON-lines sources: typed reads, loud failure, quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from py_etl_pipeline_woocommerce_spark.sources.files import (
    read_csv,
    read_jsonl,
    read_jsonl_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("total", T.DoubleType()),
    ]
)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text("order_id,status,total\n1,paid,10.50\n2,refunded,0.00\n")
    return str(p)


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "orders.jsonl"
    p.write_text(
        '{"order_id": 1, "status": "paid", "total": 10.5}\n'
        '{"order_id": 2, "status": "refunded", "total": 0.0}\n'
    )
    return str(p)


def test_read_csv_typed(spark, csv_path):
    df = read_csv(spark, csv_path, SCHEMA)
    assert df.schema == SCHEMA
    rows = {r.order_id: r for r in df.collect()}
    assert rows[1].total == 10.5 and rows[2].status == "refunded"


def test_read_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("order_id,status,total\n1,paid,10.50\nnot_a_number,x,y\n")
    with pytest.raises(Exception):
        read_csv(spark, str(p), SCHEMA).collect()


def test_read_jsonl_typed(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA)
    assert df.schema == SCHEMA
    assert df.count() == 2


def test_read_jsonl_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"order_id": 1, "status": "ok", "total": 1.0}\n{broken\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), SCHEMA).collect()


def test_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"order_id": 1, "status": "ok", "total": 1.0}\n'
        "{totally broken line\n"
        '{"order_id": 2, "status": "ok", "total": 2.0}\n'
    )
    good, bad = read_jsonl_quarantine(spark, str(p), SCHEMA)
    assert {r.order_id for r in good.collect()} == {1, 2}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "broken" in bad_rows[0][0]


def test_orc_round_trip_with_contract_check(spark, tmp_path, sf_dir):
    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.sources.files import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    dest = str(tmp_path / "docs_orc")
    write_orc(docs, dest)
    back = read_orc(spark, dest, schema=docs.schema)
    assert back.count() == docs.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    # contract check fails loudly on drifted schema
    import pytest as _pytest
    from pyspark.sql import types as T

    drifted = T.StructType([T.StructField("doc_id", T.StringType())])
    with _pytest.raises(ValueError, match="schema drift"):
        read_orc(spark, dest, schema=drifted)


def test_orc_scan_pushes_filters(spark, tmp_path, sf_dir):
    import contextlib
    import io

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.sources.files import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    dest = str(tmp_path / "docs_orc2")
    write_orc(docs, dest)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        read_orc(spark, dest).filter("doc_id < 10").select("doc_id").explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "doc_id" in plan.split("PushedFilters", 1)[1][:200]


def test_orc_contract_rejects_reordered_columns(spark, tmp_path, sf_dir):
    import pytest as _pytest
    from pyspark.sql import types as T

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.sources.files import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    dest = str(tmp_path / "docs_orc_order")
    write_orc(docs, dest)
    # same {name: type} mapping, different declared order — must fail
    reordered = T.StructType(list(reversed(docs.schema.fields)))
    with _pytest.raises(ValueError, match="schema drift"):
        read_orc(spark, dest, schema=reordered)


def test_cluster_for_skipping_yields_disjoint_row_group_ranges(spark, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.maintenance import (
        cluster_for_skipping,
    )

    orders = load_table(spark, sf_dir, "orders")
    dest = str(tmp_path / "orders_clustered")
    cluster_for_skipping(orders, dest, "o_orderdate", n_files=4)

    # read every row group's min/max for the cluster column from the
    # footers and require pairwise-disjoint (sortable) ranges
    ranges = []
    for f in glob.glob(f"{dest}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = schema_idx["o_orderdate"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            assert st is not None and st.has_min_max
            ranges.append((st.min, st.max))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping row groups: {hi1} > {lo2}"

    # and a range predicate now prunes: rows read from matching files
    # only (spot check via pyarrow filtering on the stats)
    n_total = sum(
        pq.ParquetFile(f).metadata.num_rows for f in glob.glob(f"{dest}/*.parquet")
    )
    assert n_total == orders.count()


def test_zorder_cluster_localizes_every_dimension(spark, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.maintenance import (
        zorder_cluster,
    )

    orders = load_table(spark, sf_dir, "orders")
    dest = str(tmp_path / "orders_zordered")
    zorder_cluster(orders, dest, ["o_totalprice", "o_custkey"], n_files=16)

    def coverage(col):
        spans, glo, ghi = [], None, None
        for f in glob.glob(f"{dest}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                assert st is not None and st.has_min_max
                spans.append((st.min, st.max))
                glo = st.min if glo is None else min(glo, st.min)
                ghi = st.max if ghi is None else max(ghi, st.max)
        width = ghi - glo
        return sum((hi - lo) / width for lo, hi in spans) / len(spans)

    # Z-ORDER localizes BOTH dimensions: each file covers a strict
    # subrectangle of the joint domain, so mean per-row-group span is
    # well under the full range on every clustered column (a 1-D
    # range sort gives ~0 on one column and ~1.0 on the other).
    cov_price = coverage("o_totalprice")
    cov_cust = coverage("o_custkey")
    assert cov_price < 0.7, cov_price
    assert cov_cust < 0.7, cov_cust

    # row preservation
    n_total = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{dest}/*.parquet")
    )
    assert n_total == orders.count()
    # schema is unpolluted by the helper columns
    first = glob.glob(f"{dest}/*.parquet")[0]
    names = set(pq.read_schema(first).names)
    assert names == set(orders.columns)


def test_read_binary_dir_lands_opaque_bytes(spark, tmp_path):
    from py_etl_pipeline_woocommerce_spark.sources.files import read_binary_dir

    (tmp_path / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (tmp_path / "b.jpg").write_bytes(b"\xff\xd8" + b"x" * 100)
    (tmp_path / "c.txt").write_bytes(b"not an image")
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in read_binary_dir(spark, str(tmp_path), glob="*.jpg").collect()
    }
    assert set(rows) == {"a.jpg", "b.jpg"}          # glob filtered the txt
    assert bytes(rows["a.jpg"].content) == b"\xff\xd8fakejpeg"
    assert rows["b.jpg"].length == 102
    # size cap prunes via the length column
    small = read_binary_dir(spark, str(tmp_path), glob="*.jpg", max_bytes=50)
    assert [r.path.rsplit("/", 1)[-1] for r in small.collect()] == ["a.jpg"]


def test_read_text_docs_line_and_whole_file_modes(spark, tmp_path):
    from py_etl_pipeline_woocommerce_spark.sources.files import read_text_docs

    (tmp_path / "d1.txt").write_text("first doc\nsecond doc\n\nthird doc\n")
    (tmp_path / "d2.txt").write_text("whole file doc\nwith two lines\n")
    lines = read_text_docs(spark, str(tmp_path)).collect()
    # empty lines are KEPT: row count == the files' line count, so
    # sidecar indexes / positional joins stay aligned; dropping empty
    # docs is the caller's policy, not the reader's
    assert sorted(r.text for r in lines) == sorted(
        ["first doc", "second doc", "", "third doc",
         "whole file doc", "with two lines"]
    )
    whole = read_text_docs(spark, str(tmp_path), whole_file=True).collect()
    texts = {r.doc_path.rsplit("/", 1)[-1]: r.text for r in whole}
    assert texts["d2.txt"] == "whole file doc\nwith two lines\n"
    assert len(whole) == 2


def test_orc_contract_accepts_non_nullable_schema(spark, tmp_path, sf_dir):
    """File-source reads report every column nullable=True, so a
    contract schema declaring required fields must still PASS the
    drift check (nullability is excluded from the compare — it could
    only ever false-fail, never catch real drift)."""
    from pyspark.sql import types as T

    from py_etl_pipeline_woocommerce_spark.sources.files import (
        read_orc,
        write_orc,
    )

    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    out = str(tmp_path / "orc_nn")
    write_orc(df, out)
    contract = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType(), nullable=True),
        ]
    )
    got = read_orc(spark, out, schema=contract)
    assert got.count() == 1


def test_binary_to_media_adapter(spark, tmp_path):
    """read_binary_dir -> binary_to_media -> media_metadata is the
    landing-to-operators path: deterministic path-derived media_id,
    extension-mapped modality/mime, unknown extensions kept with
    NULL modality."""
    from py_etl_pipeline_woocommerce_spark.operators.multimodal import (
        media_metadata,
    )
    from py_etl_pipeline_woocommerce_spark.sources.files import (
        binary_to_media,
        read_binary_dir,
    )

    (tmp_path / "a.png").write_bytes(b"\x89PNG-ish")
    (tmp_path / "b.WAV").write_bytes(b"RIFF-ish")
    (tmp_path / "c.xyz").write_bytes(b"mystery")
    media = binary_to_media(read_binary_dir(spark, str(tmp_path)))
    rows = {r.mime_type: r for r in media.collect()}
    assert rows["image/png"].modality == "image"
    assert rows["audio/wav"].modality == "audio"  # extension case-folded
    assert rows[None].modality is None            # unknown ext kept
    assert all(r.width is None and r.duration_ms is None
               for r in rows.values())
    # media_id is stable across two scans (pure function of path)
    again = {r.mime_type: r.media_id
             for r in binary_to_media(
                 read_binary_dir(spark, str(tmp_path))).collect()}
    assert {m: r.media_id for m, r in rows.items()} == again
    # and the frame flows straight into the operators
    assert media_metadata(media).count() == 3


def test_compact_parquet_splits_null_partition_value(spark, tmp_path):
    """A NULL-valued hive partition (__HIVE_DEFAULT_PARTITION__) must
    get the same per-value salting as any other hot value — SQL
    equality joins never match NULL keys, so the old join gave the
    NULL bucket salt modulus 1 and one oversized single-task file."""
    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.operators.maintenance import (
        compact_parquet,
    )

    df = spark.range(3000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.lit("en")).alias("lang"),
    )
    src = str(tmp_path / "null_part_src")
    df.write.mode("overwrite").partitionBy("lang").parquet(src)
    dest = str(tmp_path / "null_part_dest")
    compact_parquet(spark, src, dest, target_rows_per_file=300)
    out = spark.read.parquet(dest)
    assert out.count() == 3000
    # the NULL partition holds 1000 rows at target 300 -> >= 2 files
    import glob

    null_files = glob.glob(f"{dest}/lang=__HIVE_DEFAULT_PARTITION__/*.parquet")
    assert len(null_files) >= 2, null_files
    # and no written file exceeds the target row cap
    import pyarrow.parquet as pq

    for f in glob.glob(f"{dest}/*/*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 300, f


def test_compact_parquet_enforces_row_cap_per_file(spark, tmp_path):
    """maxRecordsPerFile enforces the per-file size contract exactly
    even when salt groups collide into one task."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.operators.maintenance import (
        compact_parquet,
    )

    df = spark.range(5000).select(
        F.col("id"), F.lit("hot").alias("lang")
    )
    src = str(tmp_path / "hot_src")
    df.write.mode("overwrite").partitionBy("lang").parquet(src)
    dest = str(tmp_path / "hot_dest")
    compact_parquet(spark, src, dest, target_rows_per_file=1000)
    for f in glob.glob(f"{dest}/*/*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 1000, f


def test_zorder_cluster_rejects_non_numeric_dimension(spark, tmp_path, sf_dir):
    import pytest as _pytest

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.maintenance import (
        zorder_cluster,
    )

    orders = load_table(spark, sf_dir, "orders")
    with _pytest.raises(ValueError, match="no numeric values"):
        zorder_cluster(
            orders, str(tmp_path / "zbad"), ["o_totalprice", "o_orderstatus"]
        )


def test_watermark_store_survives_every_corrupt_shape(tmp_path):
    """Truncated JSON, non-UTF-8 bytes, and valid-JSON-non-object all
    degrade to first-run lookback instead of bricking the run."""
    from py_etl_pipeline_woocommerce_spark.sources.state import (
        WatermarkStore,
    )

    for i, payload in enumerate(
        [b'{"since_iso": "2', b"\xff\xfe\x00bad", b"null", b"[1, 2]"]
    ):
        p = tmp_path / f"state{i}.json"
        p.write_bytes(payload)
        store = WatermarkStore(str(p), lookback_days=7)
        since = store.get_since()
        assert since and since.startswith("20")  # lookback ISO, no crash
