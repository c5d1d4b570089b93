"""Table maintenance: small-file compaction.

Streaming upserts and incremental loads (the reference's poll loop
writes one batch at a time) accrete small files; at cluster scale the
file count — not the byte count — becomes the scan bottleneck (task
per file, footer reads, driver listing). Compaction rewrites a
directory to a bounded file count.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite ``src_dir`` parquet into ``dest_dir`` with file count
    sized by row count. Returns the file count actually written
    (counted from the destination — for a partitioned tree the
    per-value salting writes ceil(value_rows/target) files per value,
    which exceeds the flat ceil(total/target) whenever values do not
    divide evenly).

    Row count comes from parquet footers (a metadata read, no scan).
    ``coalesce`` would avoid a shuffle but caps parallelism at the
    output file count and inherits input skew; ``repartition``'s
    round-robin exchange buys evenly-sized output files — the right
    trade for a maintenance job that runs off the hot path.

    Hive-partitioned sources (``key=value`` dirs, e.g. an
    ``export_shards`` tree) keep their layout: partition discovery
    turns the dir keys into columns, and a flat rewrite would
    silently COLLAPSE the directory structure — consumers mounting
    one ``lang=`` subtree would find nothing and pruning would be
    gone. Detected partition levels are re-written with
    ``partitionBy`` on a (keys, salt) repartition: clustering on the
    keys alone would funnel EVERY row of one partition value into a
    single task — a hot partition (one month holding half the table)
    would produce one giant file regardless of ``target_rows_per_file``
    and single-thread that partition's rewrite. The salt modulus is
    computed PER VALUE (``ceil(value_rows / target)`` from one
    map-side-combinable count agg, broadcast back), so a hot value
    splits into target-sized slices while a cold value keeps modulus 1
    — one bucket, one file — instead of being sprayed over ``n_files``
    small files, which is the very problem compaction exists to fix.
    """
    df = spark.read.parquet(src_dir)
    part_cols = _partition_columns(spark, src_dir)
    if part_cols:
        from pyspark.sql import functions as F

        per_value_files = (
            df.groupBy(*part_cols)
            .count()
            .select(
                *part_cols,
                F.greatest(
                    F.lit(1),
                    F.ceil(F.col("count") / F.lit(target_rows_per_file)),
                ).alias("_files_v"),
            )
        )
        # ONE pass over the aggregated counts — the old unconditional
        # df.count() re-scanned the whole table; only the group count
        # is needed (maxRecordsPerFile owns the per-file size)
        tot = per_value_files.groupBy().agg(
            F.sum("_files_v").alias("_g")
        ).first()
        n_groups = int(tot["_g"] or 1)
        # eqNullSafe, NOT on=: SQL equality never matches NULL keys,
        # so a NULL partition value (__HIVE_DEFAULT_PARTITION__) got
        # _files_v NULL -> salt modulus 1 — the hot-partition
        # single-task problem this salt exists to fix, resurrected
        # for exactly the NULL bucket
        cond = None
        for c in part_cols:
            e = df[c].eqNullSafe(per_value_files[c])
            cond = e if cond is None else (cond & e)
        salted = df.join(F.broadcast(per_value_files), cond, "left").drop(
            *[per_value_files[c] for c in part_cols]
        ).withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(F.monotonically_increasing_id()),
                F.coalesce(F.col("_files_v"), F.lit(1)),
            ),
        )
        # The shuffle spreads (value, salt) groups for PARALLELISM —
        # 2x the group count so same-value groups rarely share a task
        # — while maxRecordsPerFile ENFORCES the per-file size
        # contract exactly: even when two salt groups of one value
        # collide into a task, the writer rolls a new file at the
        # cap instead of emitting one oversized file (hash collisions
        # made the old ceil(value_rows/target) promise probabilistic).
        (
            salted.repartition(
                max(1, 2 * n_groups),
                *[F.col(c) for c in part_cols],
                F.col("_salt"),
            )
            .drop("_files_v", "_salt")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", str(target_rows_per_file))
            .partitionBy(*part_cols)
            .parquet(dest_dir)
        )
    else:
        n_rows = df.count()
        n_files = max(1, math.ceil(n_rows / target_rows_per_file))
        (
            df.repartition(n_files)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", str(target_rows_per_file))
            .parquet(dest_dir)
        )
    return _count_parquet_files(spark, dest_dir)


def _count_parquet_files(spark, path: str) -> int:
    """Data files actually written under a parquet tree (recursive,
    via the warehouse filesystem — bookkeeping files excluded)."""
    from ..functions.fsutil import hadoop_fs

    fs, p = hadoop_fs(spark, path)
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.endswith(".parquet"):
            n += 1
    return n


def _partition_columns(spark, src_dir: str) -> list[str]:
    """Hive partition keys of a parquet tree, outermost first —
    detected from the ``key=value`` directory names (the same
    structure Spark's partition discovery reads), via the Hadoop FS
    client so any warehouse scheme works."""
    from ..functions.fsutil import hadoop_fs

    fs, path = hadoop_fs(spark, src_dir)
    cols: list[str] = []
    while True:
        subdirs = [
            s.getPath()
            for s in fs.listStatus(path)
            if s.isDirectory() and "=" in s.getPath().getName()
        ]
        keys = {p.getName().split("=", 1)[0] for p in subdirs}
        if len(keys) != 1:
            break
        cols.append(keys.pop())
        path = subdirs[0]
    return cols


def ensure_columns(df, columns: dict[str, str]):
    """Schema migration: add missing columns as typed NULLs, leave
    existing columns untouched.

    Re-expresses ``/root/reference/src/tools/migrate_duckdb.py``
    (``ALTER TABLE ADD COLUMN`` if absent). Spark tables are
    schema-on-read, so "migration" is a projection: downstream code
    reads old and new data through one schema. Pair with parquet
    ``mergeSchema`` when mixed-vintage files live in one directory.
    """
    from pyspark.sql import functions as F

    out = df
    existing = set(df.columns)
    for col, dtype in columns.items():
        if col not in existing:
            out = out.withColumn(col, F.lit(None).cast(dtype))
    return out


def export_shards(
    df,
    dest_dir: str,
    partition_by: tuple[str, ...] = ("lang",),
    max_records_per_file: int = 100_000,
) -> dict[str, int]:
    """Export a prepared corpus as size-bounded training shards:
    hive-partitioned by stratum (so a loader can mount one language/
    domain without listing the rest) with ``maxRecordsPerFile``
    capping shard size — the writer splits output files at the cap,
    so downstream dataloader workers get uniformly-sized units
    regardless of stratum skew.

    Returns per-partition-directory shard counts (from the filesystem,
    not the plan — what was actually written). Listing goes through
    the Hadoop FileSystem API so the count works for ANY scheme the
    writer accepted (s3a://, hdfs://, file:/) — a local os.walk would
    silently return {} for object-store destinations.
    """
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_by)
        .parquet(dest_dir)
    )
    from ..functions.fsutil import hadoop_fs

    spark = df.sparkSession
    fs, jpath = hadoop_fs(spark, dest_dir)
    base = fs.makeQualified(jpath).toString().rstrip("/")
    shards: dict[str, int] = {}
    it = fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        p = it.next().getPath().toString()
        if not p.endswith(".parquet"):
            continue
        rel = p[len(base):].lstrip("/")
        d = rel.rsplit("/", 1)[0] if "/" in rel else "."
        shards[d] = shards.get(d, 0) + 1
    return shards


def cluster_for_skipping(
    df,
    dest_dir: str,
    cluster_col: str,
    n_files: int = 8,
) -> None:
    """Rewrite a table RANGE-CLUSTERED on ``cluster_col`` so parquet
    row-group min/max statistics actually skip data.

    A randomly-laid-out table has every row group spanning the whole
    value range — min/max stats prune nothing and every selective
    scan reads the full table. ``repartitionByRange`` +
    ``sortWithinPartitions`` gives files (and row groups within them)
    DISJOINT value ranges, so a predicate on the cluster column
    touches only the files that can contain it. At 100 TB this is the
    single cheapest scan accelerator after partitioning: one
    maintenance-window shuffle buys every future range query a
    footer-only skip of most of the table. (Multi-column needs
    space-filling-curve ordering — out of scope; pick the dominant
    filter column.)

    ``tests/test_file_sources.py`` verifies the claim against the
    actual parquet footers: written row groups must have
    non-overlapping [min, max] ranges on the cluster column.
    """
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(dest_dir)
    )


def zorder_cluster(
    df,
    dest_dir: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Rewrite a table MORTON-ORDERED (Z-ordered) on two or more
    columns so row-group min/max stats prune on EVERY clustered
    dimension — the multi-column answer to ``cluster_for_skipping``'s
    single-column range layout (and the construction behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY``). A 1-D range sort makes one
    column's ranges disjoint but leaves the others spanning the whole
    domain; interleaving the columns' bucket bits into one sort key
    gives every file a small hyper-rectangle of the joint space, so
    a selective predicate on ANY of the dimensions skips most files.

    Construction (all JVM expressions, no UDFs):
    1. Per column, equi-DEPTH bucket edges from ``percentile_approx``
       (2^bits − 1 cuts; mergeable GK, one partial-agg pass) —
       rank-space bucketing is skew-immune where min/max linear
       scaling collapses under heavy tails.
    2. Bucket id per row = count of edges ≤ value (a broadcast 1-row
       edges join + one array ``filter`` per column).
    3. Morton key = bitwise interleave of the bucket ids
       (``shiftleft``/``shiftright`` terms, bits × |cols| of them).
    4. ``repartitionByRange`` + ``sortWithinPartitions`` on the key,
       drop the helper, write.

    Cost is one GK aggregate + one range shuffle — identical shape to
    the 1-D rewrite. ``tests/test_file_sources.py`` verifies against
    real parquet footers that per-file coverage of EACH dimension's
    domain shrinks, not just the first's.
    """
    from pyspark.sql import functions as F

    if bits * len(cols) > 63:
        # the JVM masks shift counts mod 64 (and bit 63 is the sign),
        # so an oversized config would silently wrap bit positions
        # into a garbage key with no locality — refuse instead
        raise ValueError(
            f"zorder_cluster: bits({bits}) x cols({len(cols)}) = "
            f"{bits * len(cols)} interleaved bits exceed the 63 usable "
            "bits of a signed long — lower bits or cluster fewer columns"
        )
    num_cols = [f"_zv{i}" for i in range(len(cols))]
    # try_cast: under ANSI a plain cast on a non-numeric string aborts
    # the percentile job with a raw NumberFormatException; try_cast
    # funnels every non-numeric shape into the NULL-edges ValueError
    # below, which names the offending column
    staged = df.select(
        "*",
        *[
            F.col(c).try_cast("double").alias(v)
            for c, v in zip(cols, num_cols)
        ],
    )
    fracs = F.array(
        *[F.lit(i / (1 << bits)) for i in range(1, 1 << bits)]
    )
    edges = staged.agg(
        *[
            F.percentile_approx(v, fracs).alias(f"_edges{i}")
            for i, v in enumerate(num_cols)
        ]
    )
    # Collect the 1-row edges (KB — (2^bits − 1) doubles per column)
    # and VALIDATE before keying: a column that casts to all-NULL
    # doubles (non-numeric, or empty input) yields NULL edges, NULL
    # bucket ids, and a key with ZERO locality on that dimension —
    # the caller would believe the table is clustered while every
    # scan reads everything. Misconfiguration raises, like the bits
    # overflow above. The collected literals also spare the plan a
    # second percentile aggregate (the old broadcast-join recomputed
    # the agg inside the join).
    edges_row = edges.first()
    edge_lits = {}
    for i, c in enumerate(cols):
        vals = edges_row[f"_edges{i}"]
        if vals is None:
            raise ValueError(
                f"zorder_cluster: column {c!r} produced no numeric "
                "values (non-numeric type or all-NULL/empty input) — "
                "its dimension would silently contribute a constant "
                "to the Morton key; drop it from cols or fix the data"
            )
        edge_lits[i] = F.array(*[F.lit(float(e)) for e in vals])
    bucketed = staged
    z = F.lit(0).cast("long")

    def _bucket_of(edges_arr, value_col: str):
        return F.size(
            F.filter(edges_arr, lambda e: e <= F.col(value_col))
        ).cast("long")

    for i, v in enumerate(num_cols):
        bucketed = bucketed.withColumn(f"_b{i}", _bucket_of(edge_lits[i], v))
    # disjoint bit positions, so integer addition == bitwise OR
    for bit in range(bits):
        for i in range(len(cols)):
            z = z + F.shiftleft(
                F.shiftright(F.col(f"_b{i}"), bit).bitwiseAND(1).cast("long"),
                bit * len(cols) + i,
            )
    keyed = bucketed.withColumn("_zkey", z)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *num_cols, *[f"_b{i}" for i in range(len(cols))])
        .write.mode("overwrite")
        .parquet(dest_dir)
    )
