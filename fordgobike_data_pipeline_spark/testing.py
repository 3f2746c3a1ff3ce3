"""In-process loopback test doubles shared by the test suite and the
runnable examples.

``SmtpState`` + ``serve_one`` form a minimal RFC-5321 server — just
enough verbs for one smtplib ``send_message`` exchange — used to drive
the PRODUCTION smtplib client in :mod:`..sources.email_sink` (the
Python twin of the reference's nodemailer Gmail transport,
index.js:59-90) without touching the network. Living in the package
(not the test tree) keeps shipped examples importable when tests are
not distributed."""

from __future__ import annotations

import socket
import threading
from contextlib import contextmanager


class SmtpState:
    """Mailbox + failure-injection state for the loopback server."""

    def __init__(self):
        self.messages: list[dict] = []  # {"from":…, "to":[…], "data": bytes}
        self.fail_rcpt: set[str] = set()  # receivers to answer 550


def serve_one(conn: socket.socket, state: SmtpState) -> None:
    """Serve one SMTP connection: EHLO/MAIL/RCPT/DATA/QUIT, recording
    accepted messages into ``state.messages`` and 550-rejecting any
    receiver listed in ``state.fail_rcpt``."""
    f = conn.makefile("rb")

    def send(line: str) -> None:
        conn.sendall((line + "\r\n").encode())

    send("220 loopback ESMTP test")
    mail_from, rcpts, in_data, data = None, [], False, b""
    while True:
        raw = f.readline()
        if not raw:
            break
        if in_data:
            if raw.rstrip(b"\r\n") == b".":
                state.messages.append(
                    {"from": mail_from, "to": list(rcpts), "data": data}
                )
                mail_from, rcpts, in_data, data = None, [], False, b""
                send("250 OK queued")
            else:
                data += raw
            continue
        line = raw.decode(errors="replace").strip()
        verb = line.split(" ", 1)[0].upper()
        if verb in ("EHLO", "HELO"):
            send("250 loopback")
        elif verb == "MAIL":
            mail_from = line.split(":", 1)[1].strip()
            send("250 OK")
        elif verb == "RCPT":
            addr = line.split(":", 1)[1].strip().strip("<>")
            if addr in state.fail_rcpt:
                send("550 no such user")
            else:
                rcpts.append(addr)
                send("250 OK")
        elif verb == "DATA":
            in_data = True
            send("354 go ahead")
        elif verb == "QUIT":
            send("221 bye")
            break
        else:
            send("250 OK")
    conn.close()


@contextmanager
def loopback_smtp_server():
    """Context manager yielding ``(host, port, state)`` for a live
    loopback SMTP server that serves each connection on a daemon
    thread and shuts down on exit."""
    state = SmtpState()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)
    port = srv.getsockname()[1]
    alive = True

    def loop():
        while alive:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(
                target=serve_one, args=(conn, state), daemon=True
            ).start()

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    try:
        yield ("127.0.0.1", port, state)
    finally:
        alive = False
        srv.close()
