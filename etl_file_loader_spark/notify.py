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


class MultiNotifier(Notifier):
    """Fan a notification out to several transports (e.g. email stakeholders
    AND post the ops webhook, the reference's combined behavior)."""

    def __init__(self, notifiers: list[Notifier]):
        self.notifiers = list(notifiers)

    def send(self, n: Notification) -> None:
        for nt in self.notifiers:
            nt.send(n)


def notifier_from_settings(settings: dict) -> Notifier:
    """Config-driven construction (reference notify/factory.py:8-16 +
    settings.py:77-84): SMTP_HOST+FROM_EMAIL enable email, WEBHOOK_URL
    enables the webhook; both set -> fan-out; neither -> logging default.

    Keys mirror the reference's settings names: SMTP_HOST, SMTP_PORT,
    SMTP_USER, SMTP_PASSWORD, FROM_EMAIL, DATA_TEAM_EMAIL, WEBHOOK_URL.
    """
    out: list[Notifier] = []
    if settings.get("SMTP_HOST") and settings.get("FROM_EMAIL"):
        out.append(
            SmtpNotifier(
                host=settings["SMTP_HOST"],
                port=int(settings.get("SMTP_PORT") or 587),
                from_email=settings["FROM_EMAIL"],
                user=settings.get("SMTP_USER"),
                password=settings.get("SMTP_PASSWORD"),
                data_team_email=settings.get("DATA_TEAM_EMAIL"),
            )
        )
    if settings.get("WEBHOOK_URL"):
        out.append(WebhookNotifier(settings["WEBHOOK_URL"]))
    if not out:
        return Notifier()
    if len(out) == 1:
        return out[0]
    return MultiNotifier(out)


class SmtpNotifier(Notifier):
    """SMTP transport with the reference's email shape (notify/email.py:33-97):
    subject ``FileLoader Failed: <file> - <error type>``, data-team cc,
    SMTP_SSL on port 465 / STARTTLS otherwise, optional login."""

    def __init__(
        self,
        host: str,
        port: int = 587,
        from_email: str = "",
        user: str | None = None,
        password: str | None = None,
        data_team_email: str | None = None,
    ):
        self.host = host
        self.port = port
        self.from_email = from_email
        self.user = user
        self.password = password
        self.data_team_email = data_team_email

    def send(self, n: Notification) -> None:
        import smtplib
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText

        if not self.host or not self.from_email:
            logger.warning("SMTP host/from not configured, skipping email")
            return
        msg = MIMEMultipart("alternative")
        msg["Subject"] = n.subject
        msg["From"] = self.from_email
        msg["To"] = ", ".join(n.recipients)
        if self.data_team_email:
            msg["Cc"] = self.data_team_email
        msg.attach(MIMEText(n.body, "plain"))
        server = (
            smtplib.SMTP_SSL(self.host, self.port)
            if self.port == 465
            else smtplib.SMTP(self.host, self.port)
        )
        with server:
            if self.user and self.password:
                if self.port != 465:
                    server.starttls()
                server.login(self.user, self.password)
            recipients = n.recipients + (
                [self.data_team_email] if self.data_team_email else []
            )
            server.sendmail(self.from_email, recipients, msg.as_string())


class WebhookNotifier(Notifier):
    """Webhook POST with the reference's payload shape (notify/webhook.py:39-84):
    markdown-ish text + title/timestamp/level/details JSON keys."""

    LEVELS = {"file_error": ("🚨", "ERROR"), "summary": ("ℹ️", "INFO")}

    def __init__(self, url: str, timeout: float = 10.0):
        self.url = url
        self.timeout = timeout

    def payload(self, n: Notification) -> dict:
        import datetime

        icon, level = self.LEVELS.get(n.kind, ("ℹ️", "INFO"))
        ts = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S UTC"
        )
        text = "\n".join(
            [f"{icon} *{level}*", f"*{n.subject}*", f"*Timestamp:* {ts}",
             f"*Message:* {n.body}"]
        )
        return {
            "text": text,
            "title": n.subject,
            "timestamp": ts,
            "level": level,
        }

    def send(self, n: Notification) -> None:
        import json
        import urllib.request

        if not self.url:
            logger.warning("webhook URL not configured, skipping")
            return
        req = urllib.request.Request(
            self.url,
            data=json.dumps(self.payload(n)).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            if resp.status != 200:
                raise RuntimeError(f"webhook returned {resp.status}")
