import shutil
import tempfile

import pytest

from factstore_spark.session import get_spark
from factstore_spark.store import FactStore


@pytest.fixture(scope="session")
def spark():
    # Small local session for unit tests; AQE coalesces tiny shuffles.
    s = get_spark(app_name="factstore-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def store_root():
    d = tempfile.mkdtemp(prefix="factstore-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def fs(spark, store_root):
    return FactStore(spark, store_root)


@pytest.fixture()
def sf_dir():
    return "/root/testdata/sf0.001"
