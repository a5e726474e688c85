import pytest

from spider_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        app_name="spider_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.warehouse.dir": str(
                tmp_path_factory.mktemp("spark_warehouse")
            ),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
