"""Cross-engine result-type audit.

The driver's value hash is type-sensitive (q_json_extract went red in
round 1 because DuckDB summed to HUGEINT while Spark summed to BIGINT,
with identical values). This tool runs every oracle pair and reports
any column whose numeric width/family differs between the Spark result
schema and the DuckDB result schema, so mismatches are caught before a
driver round.

Usage: python tools/type_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fordgobike_data_pipeline_spark import harness  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_diff import duckdb_con  # noqa: E402

# Spark dtype / DuckDB type → comparable family:width token.
_SPARK = {
    "tinyint": "int:8", "smallint": "int:16", "int": "int:32",
    "bigint": "int:64", "float": "float:32", "double": "float:64",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bytes",
}
_DUCK = {
    "TINYINT": "int:8", "SMALLINT": "int:16", "INTEGER": "int:32",
    "BIGINT": "int:64", "HUGEINT": "int:128", "UTINYINT": "int:8",
    "USMALLINT": "int:16", "UINTEGER": "int:32", "UBIGINT": "int:64",
    "FLOAT": "float:32", "DOUBLE": "float:64", "VARCHAR": "str",
    "BOOLEAN": "bool", "DATE": "date", "TIMESTAMP": "ts", "BLOB": "bytes",
}


def _family(token: str, table: dict) -> str:
    if token.startswith("decimal") or token.startswith("DECIMAL"):
        return "decimal"
    if token.startswith("array") or token.endswith("[]"):
        return "list"
    return table.get(token, f"?{token}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(app_name="type-audit", shuffle_partitions=8)
    con = duckdb_con(args.sf)
    queries, oracles = harness.all_queries(), harness.all_oracle_sql()

    n_issues = 0
    for name, sql in oracles.items():
        sdt = dict(queries[name](spark, args.sf).dtypes)
        rel = con.sql(sql)
        ddt = dict(zip(rel.columns, [str(t) for t in rel.types]))
        for col in sdt:
            a = _family(sdt[col], _SPARK)
            b = _family(ddt.get(col, "<missing>"), _DUCK)
            if a != b:
                n_issues += 1
                print(f"MISMATCH {name}.{col}: spark={sdt[col]} duckdb={ddt.get(col)}")
    print(f"{n_issues} type mismatches across {len(oracles)} oracle queries")
    return 1 if n_issues else 0


if __name__ == "__main__":
    sys.exit(main())
