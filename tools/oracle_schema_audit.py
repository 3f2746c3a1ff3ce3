"""Audit every oracle_sql() result schema for driver-hash hazards.

The round driver hashes query results dtype-sensitively. DuckDB types
a bare ``sum(<integer col>)`` as HUGEINT, which Arrow renders as
decimal128(38,0) while Spark emits int64 — bit-identical values, but
the driver's hash rejects the dtype. This audit runs every oracle SQL
through DuckDB and reports:

  * any Arrow decimal128/decimal256 column (definite driver FAIL),
  * any column whose Arrow type *kind* differs between the Spark
    DataFrame schema and the oracle Arrow schema (int vs float vs
    string vs date vs timestamp) — inspect case by case.

Usage: python tools/oracle_schema_audit.py [--sf /root/testdata/sf0.001]
       [--no-spark] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_diff import duckdb_con, type_kind as _kind  # noqa: E402


def spark_kinds(name: str, fn, spark, sf: str) -> dict[str, str]:
    df = fn(spark, sf)
    return {f.name: _kind(f.dataType.simpleString()) for f in df.schema.fields}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--no-spark", action="store_true",
                    help="skip the Spark-side kind comparison (schema-only audit)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from fordgobike_data_pipeline_spark import harness

    oracles = harness.all_oracle_sql()
    names = args.names or list(oracles)

    spark = None
    queries = {}
    if not args.no_spark:
        from fordgobike_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name="oracle-schema-audit", shuffle_partitions=8)
        queries = harness.all_queries()

    con = duckdb_con(args.sf)
    decimal_hits: list[str] = []
    kind_mismatches: list[str] = []
    errors: list[str] = []
    for name in names:
        try:
            tbl = con.execute(oracles[name]).arrow()
        except Exception as exc:  # noqa: BLE001
            errors.append(name)
            print(f"ERR  {name}: {str(exc)[:160]}")
            continue
        bad = [f"{f.name}:{f.type}" for f in tbl.schema
               if pa.types.is_decimal(f.type)]
        if bad:
            decimal_hits.append(name)
            print(f"DEC  {name}: {', '.join(bad)}")
        if spark is not None:
            try:
                sk = spark_kinds(name, queries[name], spark, args.sf)
            except Exception as exc:  # noqa: BLE001
                errors.append(name)
                print(f"ERR  {name} (spark): {str(exc)[:160]}")
                continue
            ok = {f.name: _kind(f.type) for f in tbl.schema}
            diffs = [f"{c}: spark={sk[c]} oracle={ok[c]}"
                     for c in sk if c in ok and sk[c] != ok[c]]
            if diffs:
                kind_mismatches.append(name)
                print(f"KIND {name}: {'; '.join(diffs)}")

    print(f"\n{len(names)} audited: {len(decimal_hits)} decimal, "
          f"{len(kind_mismatches)} kind-mismatch, {len(errors)} err")
    if decimal_hits:
        print("decimal:", " ".join(sorted(decimal_hits)))
    if kind_mismatches:
        print("kind-mismatch:", " ".join(sorted(kind_mismatches)))
    return 1 if (decimal_hits or kind_mismatches or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
