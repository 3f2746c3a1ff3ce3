"""SMTP delivery transport (SURVEY §2.1 S9 — the reference's real
channel, nodemailer Gmail SMTP at index.js:59-90) and the recurrence
hook (reference scheduler cadence, Bronze_dag.py:32 ``@daily`` +
TriggerDagRunOperator chaining). The SMTP tests drive the PRODUCTION
smtplib client against a minimal in-process SMTP server on a loopback
socket (same pattern as tests/test_live_transports.py), plus a
recorded-fake path for the failure semantics."""

from __future__ import annotations

import pytest

from fordgobike_data_pipeline_spark.plans import runner
from fordgobike_data_pipeline_spark.sources import email_sink
from fordgobike_data_pipeline_spark.testing import (
    SmtpState,
    loopback_smtp_server,
    serve_one,
)

# Back-compat aliases (the loopback server now lives in the package so
# shipped examples can import it without reaching into the test tree).
_SmtpState = SmtpState
_serve_one = serve_one


@pytest.fixture()
def smtp_server():
    with loopback_smtp_server() as (host, port, state):
        yield (host, port, state)


def test_smtp_send_over_real_socket_delivers_mime_per_receiver(smtp_server):
    host, port, state = smtp_server
    results = email_sink.send_report_via_smtp(
        "batch 7 ok\nbronze 1.2s",
        ["a@example.com", "b@example.com"],
        host=host,
        port=port,
        sender_email="pipeline@example.com",
        sender_name="Air Flow User",
        subject="run report",
        reply_to="oncall@example.com",
    )
    assert results == [("a@example.com", True, "sent"), ("b@example.com", True, "sent")]
    assert len(state.messages) == 2  # one message per receiver (index.js contract)
    first = state.messages[0]
    assert first["to"] == ["a@example.com"]
    assert b"Subject: Airflow Contact: run report" in first["data"]
    assert b"Reply-To: oncall@example.com" in first["data"]
    assert b"batch 7 ok" in first["data"]
    assert b"text/html" in first["data"]  # HTML alternative part present


def test_smtp_dead_receiver_recorded_not_raised(smtp_server):
    host, port, state = smtp_server
    state.fail_rcpt.add("dead@example.com")
    results = email_sink.send_report_via_smtp(
        "report",
        ["dead@example.com", "live@example.com"],
        host=host,
        port=port,
        sender_email="p@example.com",
    )
    # print-and-continue: the 550 is recorded, the next send proceeds
    assert [r[:2] for r in results] == [
        ("dead@example.com", False),
        ("live@example.com", True),
    ]
    assert [m["to"] for m in state.messages] == [["live@example.com"]]


def test_smtp_env_contract_and_login(smtp_server, monkeypatch):
    host, port, state = smtp_server

    logins = []

    class _Fake:
        def __init__(self, *a):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def ehlo(self):
            pass

        def login(self, user, pw):
            logins.append((user, pw))

        def send_message(self, msg):
            state.messages.append(
                {"from": msg["From"], "to": [msg["To"]], "data": bytes(msg)}
            )

    monkeypatch.setenv("RECEIVER_EMAILS", "x@example.com, ,y@example.com")
    monkeypatch.setenv("EMAIL_USER", "mailer@gmail.example")
    monkeypatch.setenv("EMAIL_PASS", "app-password")
    monkeypatch.setenv("EMAIL_NAME", "Reporter")
    monkeypatch.setenv("EMAIL_SUBJ", "daily")
    monkeypatch.delenv("SENDER_EMAIL", raising=False)
    results = email_sink.send_report_via_smtp_from_env(
        "hello", host=host, port=port, smtp_factory=lambda h, p, t: _Fake()
    )
    # blank entry dropped (sender.py:21-28); creds from EMAIL_USER/PASS
    assert [r[0] for r in results] == ["x@example.com", "y@example.com"]
    assert logins == [("mailer@gmail.example", "app-password")] * 2
    assert "mailer@gmail.example" in state.messages[0]["from"]


def test_smtp_input_validation_mirrors_reference_limits():
    with pytest.raises(ValueError, match="max 2000"):
        email_sink.send_report_via_smtp(
            "x" * 2001, ["a@example.com"], host="unused"
        )
    with pytest.raises(ValueError):
        email_sink.send_report_via_smtp(
            "m", ["a@example.com"], host="unused", subject="s" * 201
        )
    with pytest.raises(ValueError):
        email_sink.send_report_via_smtp(
            "m", ["a@example.com"], host="unused", sender_name="n" * 101
        )


# ---------------------------------------------------------------------------
# Recurrence hook
# ---------------------------------------------------------------------------


def test_next_daily_fire_time_is_next_utc_midnight():
    assert runner.next_daily_fire_time(0.0) == 86400.0
    assert runner.next_daily_fire_time(86399.0) == 86400.0
    assert runner.next_daily_fire_time(86400.0) == 172800.0


def test_run_on_schedule_daily_cadence_with_fake_clock():
    now = {"t": 10_000.0}
    sleeps = []

    def clock():
        return now["t"]

    def sleep(sec):
        sleeps.append(sec)
        now["t"] += sec

    ran = []

    def run_fn(batch_id):
        ran.append((batch_id, now["t"]))
        now["t"] += 120.0  # the run itself takes 2 minutes
        return batch_id

    out = runner.run_on_schedule(run_fn, max_runs=3, clock=clock, sleep_fn=sleep)
    assert [o[0] for o in out] == ["ok", "ok", "ok"]
    # each firing lands exactly on a UTC midnight boundary
    assert [t % 86400.0 for _, t in ran] == [0.0, 0.0, 0.0]
    assert sleeps[0] == 86400.0 - 10_000.0
    # subsequent waits account for the 2-minute run (catchup=False)
    assert sleeps[1] == 86400.0 - 120.0


def test_run_on_schedule_failure_keeps_cadence():
    now = {"t": 0.0}

    def clock():
        return now["t"]

    def sleep(sec):
        now["t"] += sec

    def run_fn(batch_id):
        if batch_id == 0:
            raise RuntimeError("bronze blew up")
        return "fine"

    out = runner.run_on_schedule(
        run_fn, max_runs=2, clock=clock, sleep_fn=sleep, interval_sec=60.0
    )
    assert out[0][0] == "err" and "bronze blew up" in out[0][2]
    assert out[1] == ("ok", 1, "fine")


def test_run_on_schedule_drives_real_pipeline_and_report(spark, tmp_path):
    """Integration: the recurrence hook fires run_pipeline twice (fake
    clock, fixed interval), metrics accumulate one row per stage per
    batch, and the formatted report flows through the SMTP sink via a
    recorded fake — the full reference loop (cron -> DAG chain ->
    email) in one driver program."""
    import sys

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from tools.pipeline_bench import synth_geo, synth_trips

    from fordgobike_data_pipeline_spark.plans.runner import (
        Warehouse,
        format_run_report,
        run_pipeline,
    )

    wh = Warehouse(str(tmp_path / "wh"))
    trips, geo = synth_trips(spark, 500), synth_geo(spark)

    now = {"t": 0.0}

    def clock():
        return now["t"]

    def sleep(sec):
        now["t"] += sec

    out = runner.run_on_schedule(
        lambda b: run_pipeline(spark, wh, trips, geo, b),
        max_runs=2,
        clock=clock,
        sleep_fn=sleep,
        interval_sec=60.0,
    )
    assert [o[0] for o in out] == ["ok", "ok"]

    metrics = wh.read(spark, "_state", "run_metrics")
    per_batch = {
        r["batch_id"]: r["n"]
        for r in metrics.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_batch == {0: 4, 1: 4}  # bronze/locations/silver/gold x 2 runs

    sent = []

    class _Fake:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def ehlo(self):
            pass

        def send_message(self, msg):
            sent.append(msg)

    report = format_run_report(spark, wh)
    results = email_sink.send_report_via_smtp(
        report[:2000],
        ["ops@example.com"],
        host="unused",
        sender_email="pipeline@example.com",
        smtp_factory=lambda h, p, t: _Fake(),
    )
    assert results == [("ops@example.com", True, "sent")]
    assert "bronze" in sent[0].get_body(("plain",)).get_content()
