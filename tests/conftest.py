import pytest

from tfx_addons_feast_examplegen_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark_prop():
    # Property tests run many tiny jobs; fewer shuffle partitions keep
    # per-example latency low. Session-scoped so hypothesis examples
    # share one JVM.
    s = get_spark("tests")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.conf.set("spark.sql.shuffle.partitions", "32")
