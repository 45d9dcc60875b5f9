import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests run tiny fixtures in local[8]; the session factory's default 16 GiB
# pinned+pre-touched heap (a bench-stability setting) costs ~60 s of page
# zero-fill PER JVM on a cold box. 4 GiB is ample for every fixture and
# keeps startup ~8 s. setdefault → propagates to subprocess-spawning tests
# (spark-submit, kill9, streaming) while explicit settings still win.
os.environ.setdefault("BEAMIUM_SPARK_DRIVER_MEM", "4g")

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
