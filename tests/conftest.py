import pytest

from graphouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graphouse-tests", shuffle_partitions=8)
    yield s
