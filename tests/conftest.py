import shutil
import tempfile

import pytest

from ocr_application_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_scratch():
    d = tempfile.mkdtemp(prefix="sparkgraft_", dir="/root/repo/.scratch")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def pytest_configure(config):
    import os

    os.makedirs("/root/repo/.scratch", exist_ok=True)
