from __future__ import annotations

import pytest

from go_tfdata_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="go_tfdata_spark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
