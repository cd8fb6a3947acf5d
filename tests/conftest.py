import pytest

from flink_elasticsearch_ingestion_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
