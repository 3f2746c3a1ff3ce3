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


# ---------------------------------------------------------------------------
# SMTP transport — the reference's actual delivery channel
# ---------------------------------------------------------------------------

# The Node mailer's request validator caps the payload before any send
# (index.js:33-45: 400 on name > 100, subject > 200, message > 2000).
_MAX_NAME, _MAX_SUBJECT, _MAX_MESSAGE = 100, 200, 2000


def _validate_email_input(name: str, subject: str, message: str) -> None:
    """Mirror of validateEmailInput (index.js:24-45): reject oversized
    fields up-front with the same limits, before touching the wire."""
    if len(name) > _MAX_NAME or len(subject) > _MAX_SUBJECT or len(message) > _MAX_MESSAGE:
        raise ValueError(
            "Input too long. Name: max 100 chars, Subject: max 200 chars, "
            "Message: max 2000 chars"
        )


def _build_mime_message(
    message: str,
    receiver: str,
    sender_email: str,
    sender_name: str,
    reply_to: str | None,
    subject: str,
):
    """One MIME message per receiver, shaped like the reference's
    sendMail call (index.js:70-90): From = display-name + configured
    account, optional Reply-To, subject prefixed "Airflow Contact: ",
    plain-text body with an HTML alternative. Interpolated fields are
    html.escape()d — machine-generated report text can contain <, >, &
    (the reference's index.js interpolates raw; that is its flaw, not a
    contract worth preserving)."""
    import html as _html
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"] = f'"{sender_name}" <{sender_email}>'
    msg["To"] = receiver
    msg["Subject"] = f"Airflow Contact: {subject}"
    if reply_to:
        msg["Reply-To"] = reply_to
    msg.set_content(message)
    msg.add_alternative(
        "<div><h2>reciver from airflow</h2>"
        f"<p><strong>Name:</strong> {_html.escape(sender_name)}</p>"
        f"<p><strong>Subject:</strong> {_html.escape(subject)}</p>"
        f"<pre>{_html.escape(message)}</pre></div>",
        subtype="html",
    )
    return msg


def _smtplib_factory(host: str, port: int, timeout: float):
    """Default SMTP client: stdlib smtplib (the Python stand-in for
    nodemailer's SMTP transport, index.js:59-66)."""
    import smtplib

    return smtplib.SMTP(host, port, timeout=timeout)


def send_report_via_smtp(
    message: str,
    receiver_emails: list[str],
    host: str,
    port: int = 25,
    sender_email: str = "",
    sender_name: str = "Air Flow User",
    subject: str | None = None,
    reply_to: str | None = None,
    username: str | None = None,
    password: str | None = None,
    use_tls: bool = False,
    timeout: float = 10.0,
    smtp_factory=_smtplib_factory,
) -> list[tuple[str, bool, str]]:
    """SMTP twin of :func:`send_report_via_api` — the reference's real
    delivery path (nodemailer Gmail transport, index.js:59-90) rather
    than its HTTP façade: validates input with the mailer's own limits,
    authenticates when EMAIL_USER/EMAIL_PASS-style credentials are
    given (index.js:61-66), sends ONE MIME message per receiver, and
    keeps the print-and-continue contract — a dead receiver or a
    transient 4xx is recorded as (receiver, False, error) while the
    remaining sends proceed, so a broken mailer never fails the
    pipeline run that produced the report.

    ``smtp_factory(host, port, timeout)`` must return a context-manager
    SMTP client (smtplib.SMTP signature-compatible); tests inject a
    recorded fake or an in-process loopback server."""
    _validate_email_input(sender_name, subject or "", message)
    results: list[tuple[str, bool, str]] = []
    for receiver in receiver_emails:
        try:
            with smtp_factory(host, port, timeout) as client:
                client.ehlo()
                if use_tls:
                    client.starttls()
                    client.ehlo()
                if username and password:
                    client.login(username, password)
                client.send_message(
                    _build_mime_message(
                        message, receiver, sender_email or (username or ""),
                        sender_name, reply_to, subject or "",
                    )
                )
            results.append((receiver, True, "sent"))
        except Exception as exc:  # noqa: BLE001 — print-and-continue (index.js:93-99)
            results.append((receiver, False, str(exc)))
    return results


def send_report_via_smtp_from_env(
    message: str,
    host: str,
    port: int = 25,
    timeout: float = 10.0,
    smtp_factory=_smtplib_factory,
) -> list[tuple[str, bool, str]]:
    """Env-contract wrapper over the SMTP path, honouring BOTH env
    families: the mailer service's EMAIL_USER/EMAIL_PASS credentials
    (index.js:52-66) and the report sender's RECEIVER_EMAILS /
    EMAIL_NAME / EMAIL_SUBJ fields (sender.py:21-28)."""
    import os

    receivers = [
        e.strip()
        for e in os.environ.get("RECEIVER_EMAILS", "").split(",")
        if e.strip()
    ]
    user = os.environ.get("EMAIL_USER")
    return send_report_via_smtp(
        message,
        receivers,
        host=host,
        port=port,
        sender_email=os.environ.get("SENDER_EMAIL") or (user or ""),
        sender_name=os.environ.get("EMAIL_NAME", "Air Flow User"),
        subject=os.environ.get("EMAIL_SUBJ"),
        username=user,
        password=os.environ.get("EMAIL_PASS"),
        timeout=timeout,
        smtp_factory=smtp_factory,
    )
