"""Watermark state for incremental ingestion.

Mirrors ``/root/reference/src/etl/utils/state.py`` (a JSON file with
``since_iso``) and ``utils/time.py`` (default lookback). The file
lives on shared storage in a real deployment; the default advance
rule — max ingested order date + 1 minute — matches ``flow.py``'s
``t_advance_watermark`` EXACTLY, including its flaw: Woo's ``after``
filter is exclusive, so an order created inside that skipped minute
is never fetched by any run (a permanent gap, NOT an overlap).
``advance_from(..., overlap_minutes=1)`` selects the gap-free rule
(max − 1 minute); the idempotent delete+insert upserts make the
resulting re-reads harmless (at-least-once extract, exactly-once
warehouse state), so the overlap costs nothing but a few re-fetched
rows.
"""

from __future__ import annotations

import json
import logging
import os
import tempfile
from datetime import datetime, timedelta, timezone

log = logging.getLogger(__name__)

DEFAULT_LOOKBACK_DAYS = 30


class WatermarkStore:
    def __init__(self, path: str, lookback_days: int = DEFAULT_LOOKBACK_DAYS):
        self.path = path
        self.lookback_days = lookback_days

    def get_since(self, now: datetime | None = None) -> str:
        """Stored watermark, or now - lookback on first run
        (state.py:9-16)."""
        if os.path.exists(self.path):
            try:
                with open(self.path, encoding="utf-8") as f:
                    stored = json.load(f).get("since_iso")
            except (ValueError, OSError, AttributeError) as exc:
                # a crash mid-write can leave a truncated file; the
                # idempotent upsert makes re-ingesting the lookback
                # window safe, so degrade to first-run semantics
                # loudly instead of bricking every subsequent run.
                # ValueError covers BOTH JSONDecodeError and the
                # UnicodeDecodeError a torn multi-byte write raises;
                # AttributeError covers a file holding valid JSON
                # that is not an object ('null', '[1]') where .get
                # does not exist — every shape a corrupt state file
                # can take, not just the syntactically-invalid one
                log.warning(
                    "watermark state %s is unreadable (%s); falling "
                    "back to the first-run lookback",
                    self.path,
                    exc,
                )
                stored = None
            if stored:
                return stored
        now = now or datetime.now(timezone.utc)
        return (now - timedelta(days=self.lookback_days)).strftime(
            "%Y-%m-%dT%H:%M:%S"
        )

    def set_since(self, iso_ts: str) -> None:
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        # atomic replace: a crash between truncate and write must not
        # leave a half-written state file behind
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".state_", suffix=".json")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump({"since_iso": iso_ts}, f)
            os.replace(tmp, self.path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    @staticmethod
    def advance_from(
        max_order_date: str | None, overlap_minutes: int = 0
    ) -> str | None:
        """Next watermark. Default = max order_date + 1 minute —
        reference parity with flow.py ``t_advance_watermark``, which
        SKIPS the minute after the last ingested order (see module
        docstring). ``overlap_minutes=1`` gives the gap-free rule
        (max − 1 minute): re-reads the boundary minute instead of
        losing orders created inside it."""
        if not max_order_date:
            return None
        dt = datetime.fromisoformat(max_order_date)
        delta = timedelta(minutes=1 if overlap_minutes == 0 else -overlap_minutes)
        return (dt + delta).strftime("%Y-%m-%dT%H:%M:%S")
