import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataverifyr_spark.session import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark(
        master="local[8]",
        app_name="dataverifyr-spark-tests",
        shuffle_partitions=8,
        spark_ui_enabled="false",
        spark_driver_memory="4g",
    )
    yield s
    s.stop()
