"""Run-report email sink (SURVEY §2.1 S9).

Concrete transport for the reports :func:`plans.runner.format_run_report`
builds, matching the reference's webhook semantics
(include/modules/email_sender/sender.py:18-36): one JSON payload per
receiver POSTed to a send endpoint, sender/subject/receivers drawn from
the same env contract, per-receiver failures logged and swallowed so a
dead mailer never fails the pipeline run that produced the report.

The HTTP POST is injectable so unit tests run against a recorded fake
with zero network; production uses the requests-backed default.
"""

from __future__ import annotations

from collections.abc import Callable

PostFn = Callable[[str, dict, float], dict]


def _http_post_json(url: str, payload: dict, timeout: float) -> dict:
    """Default transport: POST JSON, raise on HTTP error, parse the
    response body (sender.py:31-33)."""
    import requests

    response = requests.post(url, json=payload, timeout=timeout)
    response.raise_for_status()
    return response.json()


def send_report_via_api(
    message: str,
    endpoint: str,
    receiver_emails: list[str],
    sender_email: str | None = None,
    sender_name: str = "Air Flow User",
    subject: str | None = None,
    timeout: float = 10.0,
    http_post: PostFn = _http_post_json,
) -> list[tuple[str, bool, str]]:
    """POST ``message`` to the mailer endpoint once per receiver
    (sender.py:22-36): payload keys name/email/subject/message/
    receiver_email, 10 s timeout, and a failed send for one receiver is
    RECORDED but does not raise or stop the remaining sends — the
    reference prints-and-continues; we return (receiver, ok, info)
    triples so callers can log or alert on partial delivery."""
    results: list[tuple[str, bool, str]] = []
    for receiver in receiver_emails:
        payload = {
            "name": sender_name,
            "email": sender_email,
            "subject": subject,
            "message": message,
            "receiver_email": receiver,
        }
        try:
            out = http_post(endpoint, payload, timeout)
            results.append((receiver, True, str(out)))
        except Exception as exc:  # noqa: BLE001 — print-and-continue (:35-36)
            results.append((receiver, False, str(exc)))
    return results


def send_report_from_env(
    message: str,
    endpoint: str,
    http_post: PostFn = _http_post_json,
    timeout: float = 10.0,
) -> list[tuple[str, bool, str]]:
    """Env-contract wrapper (sender.py:21-28): RECEIVER_EMAILS is a
    comma-separated list (blank entries dropped), EMAIL_NAME /
    SENDER_EMAIL / EMAIL_SUBJ fill the payload."""
    import os

    receivers = [
        e.strip()
        for e in os.environ.get("RECEIVER_EMAILS", "").split(",")
        if e.strip()
    ]
    return send_report_via_api(
        message,
        endpoint,
        receivers,
        sender_email=os.environ.get("SENDER_EMAIL"),
        sender_name=os.environ.get("EMAIL_NAME", "Air Flow User"),
        subject=os.environ.get("EMAIL_SUBJ"),
        timeout=timeout,
        http_post=http_post,
    )
