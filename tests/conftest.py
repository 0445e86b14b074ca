from __future__ import annotations

import pytest

from kafka_connect_fs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kcfs-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
