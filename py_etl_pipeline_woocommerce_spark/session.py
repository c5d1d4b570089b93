"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); on a real cluster the same
conf holds — AQE handles partition coalescing and skew joins at runtime,
so the static shuffle-partition count only needs to be a sane upper
bound for the scale factor being processed.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "py_etl_pipeline_woocommerce_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime partition coalescing + skew-join splitting means
      oversized shuffle-partition counts are harmless at small SF and
      required at large SF.
    - Arrow on: any Pandas-UDF path (multimodal stubs) transfers
      columnar batches, not pickled rows.
    - UTC session timezone: timestamp<->date casts match the DuckDB
      oracle bit-for-bit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # one validation for BOTH uses: a bad env value must not crash the
    # master URL — and "0" is bad too (local[0] and zero shuffle
    # partitions both fail at startup)
    if not cpus.isdigit() or int(cpus) < 1:
        cpus = "32"
    active = SparkSession.getActiveSession()
    builder = SparkSession.builder.appName(app_name)
    if shuffle_partitions is not None or active is None:
        # only pin shuffle partitions on a session WE create or when
        # the caller asked explicitly: getOrCreate applies modifiable
        # confs to an EXISTING session, and silently resetting a host
        # cluster's (say) 2000 shuffle partitions down to the local
        # CPU count would cap every big shuffle at 32 multi-TB tasks —
        # AQE can only coalesce DOWN from the configured count, never
        # raise it
        builder = builder.config(
            "spark.sql.shuffle.partitions",
            str(int(cpus) if shuffle_partitions is None else shuffle_partitions),
        )
    if active is None:
        # the full conf block only applies to a session WE create:
        # getOrCreate silently applies runtime-modifiable confs to a
        # pre-existing session too, and flipping (say) the session
        # timezone to UTC on a shared host session would alter
        # timestamp results for the host's OTHER workloads — the same
        # silent-override class the shuffle-partition guard above
        # avoids. Reusing an active session means inheriting its
        # AQE/broadcast/arrow PREFERENCES; the two LOAD-BEARING confs
        # (UTC session timezone, parquet nanosAsLong) are re-pinned by
        # ``catalog.load_table`` on every call — documented there as
        # deliberate session-global side effects — so every
        # catalog-fed path stays correct on a host session too.
        # Callers needing the full defaults on a host session pass
        # them via ``extra_conf`` (an explicit request, always
        # applied).
        builder = (
            builder
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.autoBroadcastJoinThreshold", "64m")
            # events.parquet stores TIMESTAMP(NANOS) which Spark has no
            # native type for; read as BIGINT nanoseconds and do exact
            # integer time arithmetic (also removes any µs-vs-ns
            # ambiguity against other engines).
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
        )
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
