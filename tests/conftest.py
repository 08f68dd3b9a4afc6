import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests
os.environ.setdefault("SPARK_DRIVER_MEMORY", "4g")

from dump1090_postgis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = get_spark(
        app_name="tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh")},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
