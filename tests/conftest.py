from __future__ import annotations

import pytest

from ner_app_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="ner-app-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()
