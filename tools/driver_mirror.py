"""Local mirror of the driver's per-round correctness adjudication.

Runs every oracle-eligible harness query at sf0.01 (the driver's
correctness SF) through tests/oracle_diff.compare and prints one
status line per query plus a failure summary. Use before each round
gate: any FAIL here is a red row in CORRECTNESS_r{N}.json.

Usage: python tools/driver_mirror.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fordgobike_data_pipeline_spark import harness  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_diff import compare  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="driver-mirror", shuffle_partitions=16)
    queries = harness.all_queries()
    oracles = harness.all_oracle_sql()
    names = args.names or [n for n in queries if n in oracles]

    failures = []
    for name in names:
        t0 = time.time()
        try:
            ok, msg = compare(queries[name](spark, args.sf), oracles[name], args.sf)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {exc}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name} ({dt:.1f}s)", flush=True)
        if not ok:
            failures.append((name, msg))

    print(f"\n{len(names) - len(failures)}/{len(names)} pass at {args.sf}")
    for name, msg in failures:
        print(f"--- {name}\n{msg[:2000]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
