"""Pipeline notifications — parity with the reference's email alerts
(``/root/reference/src/etl/utils/notify.py``: env-gated SMTP, silent
no-op when unconfigured, failures swallowed so alerting can never
break the pipeline).

The transport is injectable (same pattern as ``sources/rest.py``) so
tests run offline; the default SMTP transport builds lazily from the
same env contract as the reference (SMTP_HOST/PORT/USER/PASS,
NOTIFY_TO).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from ..functions.logging import get_logger

log = get_logger(__name__)

#: transport(subject, body, to) -> None
Transport = Callable[[str, str, str], None]


def _smtp_transport(subject: str, body: str, to: str) -> None:
    import smtplib
    from email.mime.text import MIMEText

    msg = MIMEText(body)
    msg["Subject"] = subject
    msg["From"] = os.environ["SMTP_USER"]
    msg["To"] = to
    with smtplib.SMTP(
        os.environ.get("SMTP_HOST", ""), int(os.environ.get("SMTP_PORT", "587"))
    ) as server:
        server.starttls()
        server.login(os.environ["SMTP_USER"], os.environ["SMTP_PASS"])
        server.sendmail(os.environ["SMTP_USER"], [to], msg.as_string())


def notify(
    text: str, level: str = "info", transport: Transport | None = None
) -> bool:
    """Send a notification; returns True if one was attempted.

    No-op (False) when NOTIFY_TO/SMTP_USER are unset — mirrors the
    reference's guard. Transport errors are swallowed: alerting must
    never fail the run that is trying to report a failure.
    """
    to = os.environ.get("NOTIFY_TO")
    # SMTP_HOST belongs in the guard: without it smtplib.SMTP("")
    # never connects, the starttls error is swallowed below, and the
    # caller is told an alert was attempted against NOTHING — the
    # exact silent misconfiguration the configured-check exists for
    configured = bool(
        to
        and os.environ.get("SMTP_USER")
        and os.environ.get("SMTP_PASS")
        and os.environ.get("SMTP_HOST")
    )
    if transport is None:
        if not configured:
            return False
        transport = _smtp_transport
    elif not to:
        return False
    subject = f"[ETL {level.upper()}] py_etl_pipeline_woocommerce_spark"
    try:
        transport(subject, text, to)
    except Exception as exc:  # noqa: BLE001 — alerting must not raise
        # through the shared logger, never stdout: the CLI's stdout
        # contract is one parseable JSON line
        log.warning("notify failed: %s", exc)
    return True
