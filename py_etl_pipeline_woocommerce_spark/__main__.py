"""CLI runner: ``python -m py_etl_pipeline_woocommerce_spark``.

The executable surface of the reference repo (``/root/reference/src/
run.py:99-150``), re-expressed over the Spark flow functions:

- default (no flags): one incremental cycle from the stored watermark
  (run.py incremental branch), re-enriching missing categories when
  the extract came back empty — run.py's "keep categories fresh
  without extra commands" behavior.
- ``--backfill D1 D2``: windowed backfill between two ISO dates
  (run.py:99-130 ``_backfill``), advancing the watermark as each
  window lands and finishing with a missing-only re-enrich pass. The
  reference runs to "now"; an explicit D2 keeps replays bounded and
  deterministic.
- ``--re-enrich`` / ``--force-all``: category re-enrichment alone —
  missing-only, or every row (run.py --force-enrich-all).
- lookback: first-run watermark is now - ``--lookback-days``
  (env ``WOO_LOOKBACK_DAYS``), mirroring utils/time.py's default.

``main`` takes injectable ``spark``/``transport`` so the offline test
suite drives the full CLI against the fake Woo transport; production
wiring defaults to ``WooHttpTransport`` configured from the WC_* env
vars and a local SparkSession.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timedelta

from .functions.logging import get_logger
from .plans import woo_flow
from .sources.state import WatermarkStore

log = get_logger(__name__)

_ISO = "%Y-%m-%dT%H:%M:%S"


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="py_etl_pipeline_woocommerce_spark",
        description="WooCommerce ETL runner (Spark engine)",
    )
    ap.add_argument(
        "--warehouse",
        default=os.getenv("WOO_WAREHOUSE_DIR", "./warehouse"),
        help="warehouse directory (parquet tables + watermark state)",
    )
    ap.add_argument(
        "--state",
        default=None,
        help="watermark JSON path (default: <warehouse>/state.json)",
    )
    ap.add_argument(
        "--lookback-days",
        type=int,
        default=int(os.getenv("WOO_LOOKBACK_DAYS", "30")),
        help="first-run watermark lookback (run.py default 30)",
    )
    ap.add_argument(
        "--backfill",
        nargs=2,
        metavar=("D1", "D2"),
        help="backfill the ISO date range [D1, D2) in windows",
    )
    ap.add_argument(
        "--window-days",
        type=int,
        default=30,
        help="backfill window size in days (run.py:99)",
    )
    ap.add_argument(
        "--retries",
        type=int,
        default=2,
        help="re-run a failed ingest cycle this many times "
        "(flow.py:44 @task(retries=2))",
    )
    ap.add_argument(
        "--retry-delay-sec",
        type=float,
        default=30.0,
        help="delay between ingest retries "
        "(flow.py:44 retry_delay_seconds=30)",
    )
    ap.add_argument(
        "--re-enrich",
        action="store_true",
        help="re-enrich categories for items missing them",
    )
    ap.add_argument(
        "--force-all",
        action="store_true",
        help="re-enrich categories for ALL items (overwrites existing)",
    )
    return ap


def _parse_iso(d: str) -> str:
    return datetime.fromisoformat(d).strftime(_ISO)


def _backfill(
    spark,
    transport,
    state,
    warehouse,
    d1,
    d2,
    window_days,
    retries: int = 0,
    retry_delay_sec: float = 30.0,
    force_all: bool = False,
) -> dict:
    """run.py:99-130: advance a cursor through [d1, d2), one
    incremental cycle per window; the cursor jumps by max ingested
    date + 1 minute when data lands, else by the window size."""
    if window_days <= 0:
        # window_end would never move past the cursor: an infinite
        # loop hammering the API and rewriting state.json forever
        raise ValueError(
            f"--window-days must be positive, got {window_days}"
        )
    cursor, end = _parse_iso(d1), _parse_iso(d2)
    # The production watermark must survive the backfill in BOTH
    # directions: never REWOUND to the historical cursor (the next
    # incremental run would re-extract everything since it), and
    # never OVERSHOT into the future by trailing EMPTY windows (a d2
    # past the newest order would park the watermark years ahead and
    # every later incremental run would silently skip all new
    # orders). The loop stamps set_since(cursor) per window for the
    # extract's `after` bound; the finally settles the FINAL value to
    # max(prior watermark, newest actually-INGESTED advance).
    prior_since = state.get_since()
    max_ingested_since = None
    total_orders = total_items = windows = 0
    try:
        while cursor < end:
            window_end = min(
                (
                    datetime.fromisoformat(cursor)
                    + timedelta(days=window_days)
                ).strftime(_ISO),
                end,
            )
            state.set_since(cursor)
            # the extract is bounded ABOVE too (Woo `before`): one
            # window per cycle, never everything-after-the-cursor
            stats = woo_flow.incremental_run(
                spark,
                transport,
                state,
                warehouse,
                before_iso=window_end,
                retries=retries,
                retry_delay_sec=retry_delay_sec,
            )
            windows += 1
            total_orders += stats["orders"]
            total_items += stats["items"]
            advanced = state.get_since()
            if stats["orders"] and advanced > cursor:
                cursor = advanced
                if (
                    max_ingested_since is None
                    or advanced > max_ingested_since
                ):
                    max_ingested_since = advanced
            else:
                cursor = window_end
    finally:
        final = prior_since
        if max_ingested_since is not None and max_ingested_since > final:
            final = max_ingested_since
        if state.get_since() != final:
            state.set_since(final)
    # final re-enrich pass (run.py:128-130); --force-all reaches the
    # backfill path too instead of being silently dropped
    enrich_stats = woo_flow.re_enrich_run(
        spark, transport, warehouse, force_all=force_all
    )
    return {
        "mode": "backfill",
        "windows": windows,
        "orders": total_orders,
        "items": total_items,
        **enrich_stats,
    }


def main(argv: list[str] | None = None, spark=None, transport=None) -> dict:
    args = build_parser().parse_args(argv)
    if spark is None:
        from .session import get_spark

        spark = get_spark("woo-etl")
    if transport is None:
        from .sources.http_transport import WooHttpTransport

        transport = WooHttpTransport()
    state = WatermarkStore(
        args.state or os.path.join(args.warehouse, "state.json"),
        lookback_days=args.lookback_days,
    )

    if args.backfill:
        out = _backfill(
            spark,
            transport,
            state,
            args.warehouse,
            args.backfill[0],
            args.backfill[1],
            args.window_days,
            retries=args.retries,
            retry_delay_sec=args.retry_delay_sec,
            force_all=args.force_all,
        )
    else:
        stats = woo_flow.incremental_run(
            spark,
            transport,
            state,
            args.warehouse,
            retries=args.retries,
            retry_delay_sec=args.retry_delay_sec,
        )
        out = {"mode": "incremental", **stats}
        # run.py:141-147: --force-all overwrites every snapshot;
        # --re-enrich (or an empty extract) refreshes missing ones
        if args.force_all:
            out.update(
                woo_flow.re_enrich_run(
                    spark, transport, args.warehouse, force_all=True
                )
            )
        elif args.re_enrich or stats["orders"] == 0:
            out.update(woo_flow.re_enrich_run(spark, transport, args.warehouse))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    # main() returns a dict or raises (the interpreter already exits
    # non-zero on an exception) — no failure-as-None protocol exists
    main()
