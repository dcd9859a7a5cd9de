from __future__ import annotations

import pytest

from cpg_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="cpg_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
