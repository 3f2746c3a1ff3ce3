"""Scheduled deployment — the reference's full operational loop in one
driver program.

    python examples/scheduled_pipeline.py

The reference runs this as four Airflow DAGs (ddl @once, bronze
@daily, silver/gold trigger-chained) plus a Node SMTP microservice
for the run report. Here the same loop is one long-lived Spark driver:

    run_on_schedule            <- @daily cron (Bronze_dag.py:32)
      └─ run_pipeline          <- bronze → silver → gold, per-stage
                                  retries (TriggerDagRunOperator chain)
    format_run_report          <- Airflow-REST metrics scrape
      └─ send_report_via_smtp  <- nodemailer Gmail transport
                                  (index.js:59-90)

This demo compresses the cadence (interval_sec=0 instead of midnight
anchors) and delivers the report to an in-process loopback SMTP
server so it runs anywhere; production wiring swaps the interval for
the daily default and the host for a real relay + EMAIL_USER /
EMAIL_PASS / RECEIVER_EMAILS env (send_report_via_smtp_from_env).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fordgobike_data_pipeline_spark.plans import runner as runner_mod  # noqa: E402
from fordgobike_data_pipeline_spark.plans.runner import (  # noqa: E402
    Warehouse,
    format_run_report,
    run_pipeline,
)
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402
from fordgobike_data_pipeline_spark.sources import email_sink  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="scheduled-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.pipeline_bench import synth_geo, synth_trips

    wh = Warehouse(tempfile.mkdtemp(prefix="sched_demo_wh_"))
    trips, geo = synth_trips(spark, 2_000), synth_geo(spark)

    # Two back-to-back firings (a real deployment passes no
    # interval_sec — the loop then anchors to the next UTC midnight,
    # catchup=False — and a large max_runs).
    outcomes = runner_mod.run_on_schedule(
        lambda batch_id: run_pipeline(spark, wh, trips, geo, batch_id),
        max_runs=2,
        interval_sec=0.0,
    )
    for status, batch_id, info in outcomes:
        print(f"firing {batch_id}: {status} {info}")

    report = format_run_report(spark, wh)
    print(report)

    # Loopback SMTP so the demo is self-contained (packaged helper);
    # swap host/port for a real relay in production.
    from fordgobike_data_pipeline_spark.testing import loopback_smtp_server

    with loopback_smtp_server() as (host, port, state):
        results = email_sink.send_report_via_smtp(
            report[:2000],
            ["ops@example.com"],
            host=host,
            port=port,
            sender_email="pipeline@example.com",
            subject="scheduled run report",
        )
        print("smtp delivery:", results)
        assert results[0][1], results
        print("report delivered over SMTP:", len(state.messages), "message(s)")


if __name__ == "__main__":
    main()
