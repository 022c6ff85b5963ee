from __future__ import annotations

import pytest

from bigdatagenomic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bdg-tests", cpus=8, shuffle_partitions=8)
    yield s
