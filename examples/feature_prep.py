"""Feature-preparation walkthrough — the round-6 tabular/ML surface
in one script.

    python examples/feature_prep.py [sf_dir]

Loads the testdata warehouse tables and runs the feature-prep
operators a model-training pipeline applies before any fit: leave-
one-out target encoding, the hashing trick, top-k one-hot, per-group
min-max scaling — then the time-series probes (ACF, CUSUM
changepoint, DOW seasonality) and the budget allocator over the
document corpus. Everything prints a small head() so the output
shapes are visible.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fordgobike_data_pipeline_spark.io import load_tables  # noqa: E402
from fordgobike_data_pipeline_spark.operators import features, temporal  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="feature-prep-example")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ("orders", "part", "events"))

    print("== leave-one-out target encoding (orders priority -> value) ==")
    enc = features.target_encode_loo(
        t["orders"].select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ),
        "o_orderpriority",
        "cents",
    )
    enc.select("o_orderkey", "o_orderpriority", "te_loo").show(5)

    print("== feature hashing (part brand/type -> 64 signed buckets) ==")
    features.feature_hash(t["part"], ["p_brand", "p_type"], n_buckets=64).orderBy(
        "feature", "bucket"
    ).show(5)

    print("== top-5 one-hot over part brand ==")
    features.onehot_topk(
        t["part"].select("p_partkey", "p_brand"), "p_brand", k=5
    ).show(5)

    print("== per-type min-max scaled retail price ==")
    features.minmax_scale(
        t["part"].select("p_partkey", "p_type", "p_retailprice"),
        "p_retailprice",
        "p_type",
    ).show(5)

    print("== daily-count autocorrelation, lags 1..7 ==")
    temporal.acf_daily(t["events"], max_lag=7).orderBy("lag").show()

    print("== CUSUM changepoint over daily event value ==")
    temporal.cusum_changepoint(t["events"]).show()

    print("== day-of-week seasonal index ==")
    temporal.seasonal_profile_dow(t["events"]).orderBy("dow").show()


if __name__ == "__main__":
    main()
