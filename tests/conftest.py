import pytest

from userbehavioranalysis_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("uba-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
