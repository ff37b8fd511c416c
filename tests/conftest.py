import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Activate the vendored protobuf shim BEFORE any SparkSession exists:
# the JVM inherits PYTHONPATH at launch and passes it to the Python
# workers that run the transformWithStateInPandas state client, so the
# install must precede the first getOrCreate anywhere in the test run.
# No-op when a real google.protobuf is installed.
from spider_spark import protoshim  # noqa: E402

protoshim.install()


@pytest.fixture(scope="session")
def spark():
    from spider_spark.session import get_spark

    s = get_spark(
        app_name="spider_spark_tests", master="local[4]", shuffle_partitions=4
    )
    yield s
    s.stop()
