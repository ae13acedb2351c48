"""Notification hooks (reference src/pipeline/notify/: email + webhook).

The reference emails stakeholders on handled file errors and POSTs a webhook
on unhandled failures / run summaries. Network egress is environment-specific,
so the engine ships the *contract*: a ``Notifier`` protocol with a logging
default and a callable-hook adapter; SMTP/webhook transports plug in by
implementing ``send``. The pipeline Processor calls these at the same points
the reference does (per-file handled error -> notify_file_error with the
source's notification_emails; run end -> notify_summary).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)


@dataclass
class Notification:
    kind: str  # "file_error" | "summary"
    subject: str
    body: str
    recipients: list[str] = field(default_factory=list)


class Notifier:
    """Default: structured log lines (swap in SMTP/webhook via send())."""

    def send(self, n: Notification) -> None:
        logger.warning("[notify:%s] %s -> %s | %s", n.kind, n.subject, n.recipients, n.body)


class CallableNotifier(Notifier):
    """Adapter: forward notifications to a user callable (tests, webhooks)."""

    def __init__(self, fn: Callable[[Notification], None]):
        self.fn = fn

    def send(self, n: Notification) -> None:
        self.fn(n)


def notify_file_error(
    notifier: Notifier, filename: str, error_type: str, message: str, recipients: list[str]
) -> None:
    notifier.send(
        Notification(
            kind="file_error",
            subject=f"File load failed: {filename} ({error_type})",
            body=message,
            recipients=recipients,
        )
    )


def notify_summary(notifier: Notifier, summary: dict) -> None:
    notifier.send(
        Notification(
            kind="summary",
            subject=(
                f"File load run: {summary.get('succeeded', 0)} ok, "
                f"{summary.get('failed', 0)} failed, "
                f"{summary.get('no_source', 0)} skipped"
            ),
            body=str(summary),
        )
    )
