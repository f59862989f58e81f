"""Task failure policy: retries + notification on final failure.

The reference's scheduler wraps every task in a default policy —
5 retries, then an email to the operator on failure
(dags/kucoin_main_dag.py:12-15: ``'retries': 5,
'email_on_failure': True``; same block in dags/kucoin_lending_dag.py;
``AlertPolicy.retries`` is the parameter, defaulting to 1 for
fast-failing test fixtures). The
engine's pipelines are idempotent and resumable (PK upserts,
effectively-once streaming sinks, snapshot batch-id ledgers), which
removes the DATA reasons to babysit a failure — but an operator
still has to find out. This module is that seam:

- ``run_task(name, fn, policy)`` executes a task under an
  ``AlertPolicy``: transient failures retry (with optional delay);
  the FINAL failure builds an alert record, hands it to every
  configured notifier, and re-raises — alerting never swallows the
  error, exactly like the reference scheduler (the task still fails;
  the email is a side channel).
- ``file_notifier(path)`` appends alert records as JSON lines — the
  durable ledger a monitoring stack tails.
- ``smtp_notifier(...)`` delivers over real SMTP via stdlib
  smtplib — the reference's transport, no dependencies. Tested
  end-to-end against a loopback SMTP server (the same
  wire-protocol-over-loopback discipline as sources/rest.py's HTTP
  source and sources/dbsink.py's DB-API sink).

Scale note: the policy runs on the DRIVER around whole tasks (it is
the scheduler's concern, not the executors'); per-record failures
inside a task belong to the data-contract operators
(operators/quality.py), not here.
"""

from __future__ import annotations

import json
import time
import traceback
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class AlertPolicy:
    """Reference-default shape: one retry, notify on final failure."""

    retries: int = 1
    retry_delay_s: float = 0.0
    notifiers: list[Callable[[dict], None]] = field(default_factory=list)


def run_task(name: str, fn: Callable[[], object], policy: AlertPolicy):
    """Run ``fn`` under the policy. Returns its result; on final
    failure notifies every notifier with an alert record and
    RE-RAISES the original error (notification is a side channel,
    never error handling). A notifier that itself fails must not mask
    the task error — its exception is chained as context."""
    attempts = policy.retries + 1
    last: Exception | None = None
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        # Exception only: KeyboardInterrupt/SystemExit must propagate
        # immediately, never retried or turned into failure alerts.
        except Exception as exc:
            last = exc
            if attempt < attempts:
                if policy.retry_delay_s:
                    time.sleep(policy.retry_delay_s)
                continue
            alert = {
                "task": name,
                "attempts": attempt,
                "error_type": type(exc).__name__,
                "error": str(exc)[:500],
                "traceback": traceback.format_exc(limit=5),
            }
            for notify in policy.notifiers:
                try:
                    notify(alert)
                except Exception as notify_exc:
                    # surface the broken notifier without masking the
                    # task failure
                    last = exc
                    exc.__context__ = notify_exc
            raise
    raise last  # unreachable; keeps type checkers honest


def file_notifier(path: str) -> Callable[[dict], None]:
    """Append each alert as one JSON line — the durable alert ledger."""

    def notify(alert: dict) -> None:
        with open(path, "a") as fh:
            fh.write(json.dumps(alert) + "\n")

    return notify


def smtp_notifier(
    host: str,
    port: int,
    sender: str,
    recipients: list[str],
    subject_prefix: str = "[pipeline failure]",
) -> Callable[[dict], None]:
    """Deliver alerts over SMTP (stdlib smtplib) — the reference
    scheduler's 'email_on_failure' transport. The message is plain
    RFC 5322 text; auth/TLS are the deployment's concern and layer on
    the same seam."""

    def notify(alert: dict) -> None:
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        msg["Subject"] = (
            f"{subject_prefix} {alert['task']} failed after "
            f"{alert['attempts']} attempt(s): {alert['error_type']}"
        )
        msg.set_content(json.dumps(alert, indent=2))
        with smtplib.SMTP(host, port, timeout=10) as smtp:
            smtp.send_message(msg)

    return notify
