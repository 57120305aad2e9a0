import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from pageindex_spark.session import get_spark, warm_up

    s = get_spark(app_name="pageindex-tests", cores=8, shuffle_partitions=8)
    warm_up(s)  # absorb one-time JIT cost outside the tests
    yield s


@pytest.fixture(scope="session")
def sf_unit_dir(tmp_path_factory):
    """Materialize the sf-unit (1,000 doc) synthetic corpus once per session."""
    from pageindex_spark.sources.corpus import ensure_scale

    return ensure_scale("sf-unit", base_dir="/root/repo/data")


@pytest.fixture(scope="session")
def sf_micro_dir(tmp_path_factory):
    """300-doc corpus for the slow kill/resume end-to-end test."""
    from pageindex_spark.sources.corpus import ensure_scale

    return ensure_scale("sf-micro", base_dir="/root/repo/data")
