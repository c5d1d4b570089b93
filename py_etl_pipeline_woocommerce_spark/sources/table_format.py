"""Dep-gated Delta Lake routing for the warehouse stores.

The parquet stores are correct but hand-rolled: dynamic partition
overwrite for keyed upserts, and a staged-commit + batch-id-marker
replay protocol for the streaming rollup fold (the crash windows are
enumerated and tested in ``operators/warehouse.merge_rollup_store``).
A production deployment puts an ACID table format under those paths
instead — the transaction log IS the commit point, concurrent
readers never see a partial month, and S3A loses its rename caveat.

This module is the routing seam: every function degrades loudly (a
clear ImportError naming the missing package), nothing here imports
``delta`` at module load, and the parquet paths remain the default
everywhere — ``table_format="delta"`` is opt-in per call. Parity
with the parquet routes is asserted by ``tests/test_table_format.py``
(skipped when delta-spark is not installed, like the other dep-gated
seams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    """True when delta-spark is importable in this environment."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _require_delta():
    try:
        from delta.tables import DeltaTable

        return DeltaTable
    except ImportError as e:  # pragma: no cover - exercised via route
        raise ImportError(
            "table_format='delta' requires the delta-spark package "
            "(and a SparkSession built with "
            "delta.sql.DeltaSparkSessionExtension); install it or use "
            "the default table_format='parquet'"
        ) from e


def _sql_str_literal(v) -> str:
    """SQL literal for a partition value, formatted by type (NULL-safe):
    ints/floats unquoted, bools TRUE/FALSE, date/datetime as typed
    DATE/TIMESTAMP literals, everything else a quoted string — so a
    non-string partition column compares against a canonical literal
    instead of relying on implicit casts of ``str(v)`` output."""
    import datetime as _dt
    import numbers as _numbers

    # numpy scalars are NOT subclasses of the Python builtins they
    # mimic (np.int64 is not int, np.bool_ is not bool under any
    # numpy; only np.float64 subclasses float), so dispatch on the
    # ABCs — np.bool_ registers as neither bool nor Integral, hence
    # the explicit type-name check
    if v is None:
        return "NULL"
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return "TRUE" if v else "FALSE"
    if isinstance(v, _numbers.Integral):
        # normalize through int(): numpy integer scalars repr as
        # 'np.int64(3)' under numpy>=2, which is not SQL
        return repr(int(v))
    if isinstance(v, _numbers.Real):
        f = float(v)  # numpy float scalars likewise repr as np.float64(…)
        if f != f or f in (float("inf"), float("-inf")):
            raise ValueError(
                "non-finite float partition value "
                f"{f!r} has no SQL literal form"
            )
        return repr(f)
    if isinstance(v, _dt.datetime):
        return "TIMESTAMP'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, _dt.date):
        return "DATE'" + v.isoformat() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _touched_partition_predicate(
    batch: DataFrame, partition_col: str, qualifier: str = ""
) -> str:
    """SQL predicate selecting the batch's partitions — the bounded
    collect both Delta routes share (a batch spans a handful of
    partitions regardless of table age). NULL partition values get an
    explicit IS NULL arm (IN () never matches NULL)."""
    vals = [
        r[0] for r in batch.select(partition_col).distinct().collect()
    ]
    col = qualifier + partition_col
    non_null = [v for v in vals if v is not None]
    preds = []
    if non_null:
        preds.append(
            f"{col} IN ("
            + ", ".join(_sql_str_literal(v) for v in non_null)
            + ")"
        )
    if len(non_null) != len(vals):
        preds.append(f"{col} IS NULL")
    return " OR ".join(preds) or "false"


def upsert_partitioned_delta(
    batch: DataFrame, path: str, partition_col: str
) -> None:
    """Delta twin of ``upsert_partitioned_parquet``: one ACID commit
    replaces ONLY the partitions present in the batch via
    ``replaceWhere`` — the delete+insert of every touched partition
    happens atomically in the transaction log, so concurrent readers
    see either the old partition or the new one, never a half-written
    directory (the parquet route's S3A caveat).

    The touched-partition list is collected (a batch spans a handful
    of partitions regardless of table age — the same bounded-probe
    argument as the parquet route).
    """
    _require_delta()
    (
        batch.write.format("delta")
        .mode("overwrite")
        .option(
            "replaceWhere",
            _touched_partition_predicate(batch, partition_col),
        )
        .partitionBy(partition_col)
        .save(path)
    )


def merge_rollup_delta(
    spark: SparkSession,
    store_path: str,
    batch: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    partition_col: str | None = None,
    batch_id: int | None = None,
    app_id: str = "rollup-merge",
) -> None:
    """Delta twin of the rollup fold: one MERGE adds the batch's
    associative partials into matching key rows and inserts new keys
    — retiring the staged-commit/marker replay machinery on this
    route (Delta's log is the commit point).

    At-least-once replay protection (the reason the parquet route
    needs markers at all) uses Delta's idempotent-write contract:
    when ``batch_id`` is given, the session-level
    ``txnAppId``/``txnVersion`` pair makes a re-delivered micro-batch
    a no-op instead of a double-count.

    ``partition_col`` (when the store is partitioned, e.g. month)
    is added to the merge condition so the MERGE prunes to the
    batch's partitions instead of scanning the table.
    """
    DeltaTable = _require_delta()
    # txnAppId/txnVersion are SESSION confs for MERGE (Delta's
    # idempotent-write contract has no merge-level writer option);
    # scope them to this call with try/finally — left set, every
    # later Delta write in the session would inherit this batch's
    # transaction identity and be silently skipped as a replay.
    _TXN_APP = "spark.databricks.delta.write.txnAppId"
    _TXN_VER = "spark.databricks.delta.write.txnVersion"
    if batch_id is not None:
        spark.conf.set(_TXN_APP, app_id)
        spark.conf.set(_TXN_VER, str(batch_id))
    try:
        _merge_rollup_delta_body(
            spark, DeltaTable, store_path, batch, keys, sum_cols,
            partition_col,
        )
    finally:
        if batch_id is not None:
            spark.conf.unset(_TXN_APP)
            spark.conf.unset(_TXN_VER)


def _merge_rollup_delta_body(
    spark, DeltaTable, store_path, batch, keys, sum_cols, partition_col
):
    if not DeltaTable.isDeltaTable(spark, store_path):
        w = batch.write.format("delta").mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.save(store_path)
        return
    tgt = DeltaTable.forPath(spark, store_path)
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    if partition_col:
        pred = _touched_partition_predicate(
            batch, partition_col, qualifier="t."
        )
        cond += f" AND ({pred})"
    upd = {c: F.expr(f"t.{c} + s.{c}") for c in sum_cols}
    (
        tgt.alias("t")
        .merge(batch.alias("s"), cond)
        .whenMatchedUpdate(set=upd)
        .whenNotMatchedInsertAll()
        .execute()
    )


def append_partials_delta(
    batch: DataFrame,
    path: str,
    app_id: str,
    batch_id: int | None = None,
    mode: str = "append",
) -> None:
    """Delta twin of the line-index partial append: an ACID append
    whose ``txnAppId``/``txnVersion`` writer options make re-delivered
    micro-batches no-ops — the transaction log replaces the staged
    external-table + marker + rename protocol wholesale. (Delta has
    no Spark bucketing; the exchange-free fold property instead comes
    from the reader's AQE shuffle on the fold key, or OPTIMIZE ZORDER
    on ``line_hash`` at maintenance time.)"""
    _require_delta()
    if mode not in ("append", "overwrite"):
        raise ValueError(
            f"append_partials_delta: unknown mode {mode!r}"
        )
    w = batch.write.format("delta").mode(mode)
    if batch_id is not None:
        w = w.option("txnAppId", app_id).option(
            "txnVersion", str(batch_id)
        )
    w.save(path)
