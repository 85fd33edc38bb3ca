import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light


@pytest.fixture(scope="session")
def spark():
    from lucene_1_spark.session import get_spark
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tmp_root():
    d = tempfile.mkdtemp(prefix="lucene_1_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
