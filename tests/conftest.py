import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geospatial_studio_pipelines_spark.session import spark_session


@pytest.fixture(scope="session")
def spark():
    s = spark_session(app_name="gsp-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
