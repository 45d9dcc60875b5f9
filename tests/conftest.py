import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beamium_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="beamium_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_web_pages(spark):
    """2k-row deterministic web_pages fixture (FIXTURES.md F-1 'tiny')."""
    from beamium_spark.sources.synth import ensure_web_pages

    path = ensure_web_pages(0.0003)
    return spark.read.parquet(path)
