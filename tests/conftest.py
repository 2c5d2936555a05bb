from __future__ import annotations

import pytest

from datax_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="datax-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/dsx-warehouse"},
    )
    yield s
    s.stop()
