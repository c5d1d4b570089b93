"""File-format sources: CSV and JSON-lines readers with mandatory
explicit schemas and loud failure on malformed rows.

The reference ingests REST JSON into a DuckDB warehouse; an engine
meant to replace it must also mount the flat files a data platform
actually exchanges (exports, vendor drops, landing zones). Two rules
make these safe at 100 TB:

- **No inferSchema, ever.** Schema inference scans the data twice and
  silently retypes on drift; every reader here requires a
  ``StructType`` up front (the canonical ones live in ``schemas.py``).
- **FAILFAST by default.** A malformed row is a pipeline bug, not a
  row to quietly null out. ``PERMISSIVE`` + ``_corrupt_record`` is
  available explicitly for quarantine flows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """Typed CSV scan. Splittable (parallel by byte range) as long as
    rows don't embed newlines — for quoted multiline fields pass
    ``multiLine=true`` knowing it serializes each file to one task."""
    return (
        spark.read.schema(schema)
        .options(header=header, sep=delimiter, mode=mode, **options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """Typed JSON-lines scan (one object per line — the splittable
    layout; whole-file JSON documents need ``multiLine`` and lose
    intra-file parallelism)."""
    return spark.read.schema(schema).options(mode=mode, **options).json(path)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    persisted_frames: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON-lines scan split into (good, quarantined) —
    the landing-zone pattern when upstream can't be trusted to be
    well-formed: good rows flow on, corrupt raw lines are preserved
    for triage instead of killing the job or vanishing.

    ``persisted_frames`` is accepted for backward compatibility and
    no longer needed: the shared scan is a lazy ``localCheckpoint``
    rather than a ``cache()``, so its blocks are released by Spark's
    ContextCleaner once the returned frames go out of scope instead
    of pinning one copy per call for the session's lifetime.
    """
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL)
        .json(path)
        # Spark disallows filtering raw file scans on the corrupt
        # column alone (SPARK-21610); materializing the parsed frame
        # is the documented unblock — and both branches reuse the one
        # scan. Lazy checkpoint, not cache: GC-managed lifetime.
        .localCheckpoint(eager=False)
    )
    if persisted_frames is not None:
        persisted_frames.append(raw)
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """ORC scan — the other columnar interchange format warehouses
    exchange (Hive-lineage platforms export ORC where lakehouses use
    parquet). Self-describing like parquet, so the schema argument is
    an optional *contract check* rather than required typing: when
    given, a drifted file fails loudly instead of silently widening.
    Predicate pushdown and column pruning work exactly as for parquet
    (pin them with ``.explain`` — ``PushedFilters``/``ReadSchema``).
    """
    df = spark.read.options(**options).orc(path)
    if schema is not None:
        # Full positional contract: name, type, nullability, in
        # declared order. A dict compare would let reordered columns
        # or nullability drift slip through the "fails loudly" claim.
        got = [(f.name, f.dataType, f.nullable) for f in df.schema.fields]
        want = [(f.name, f.dataType, f.nullable) for f in schema.fields]
        if got != want:
            raise ValueError(
                f"ORC schema drift at {path}: got {got}, expected {want}"
            )
    return df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC writer (zlib default; columnar, splittable)."""
    df.write.mode(mode).orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-asset ingestion via Spark's built-in ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content) —
    the landing step that feeds the multimodal pipeline
    (``operators/multimodal.py`` expects exactly this binary-column
    shape). Images/audio/video land as opaque bytes; decode happens
    downstream in Arrow-batched UDFs, never here.

    ``glob`` filters by pattern at the LISTING level
    (``pathGlobFilter`` — unmatched files are never opened);
    ``max_bytes`` pushes a length predicate that skips oversized
    assets from the file footer stats. At 100 TB the directory is
    millions of objects: listing parallelizes across the cluster, and
    each file is one task-local read — no shuffle at all.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_text_docs(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
) -> DataFrame:
    """Raw-text corpus ingestion via the built-in ``text`` source:
    ``whole_file=False`` maps one LINE per document row (the JSONL-
    adjacent "one doc per line" crawl export), ``whole_file=True``
    maps one FILE per document (book/article dumps). Output is
    (doc_path, text) ready for ``doc_fingerprint``/``corpus_prep``;
    a stable doc_id comes from the existing md5 helpers downstream.

    Pure scan, no shuffle; line mode splits large files across tasks,
    whole-file mode is one task per file (bounded by the largest
    document — chunk upstream if files exceed executor memory).
    """
    # NOTE: must be the .text() kwarg — DataFrameReader.text() passes
    # its own wholetext default, which overrides a prior .option().
    df = (
        spark.read.text(path, wholetext=whole_file)
        .select(
            F.input_file_name().alias("doc_path"),
            F.col("value").alias("text"),
        )
    )
    if not whole_file:
        df = df.filter(F.length("text") > 0)
    return df
