from __future__ import annotations

import pytest

from fordgobike_data_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="fordgobike-tests", shuffle_partitions=8)
    yield spark
