import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from pageindex_spark.session import get_spark

    s = get_spark(app_name="pageindex-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_unit_dir(tmp_path_factory):
    """Materialize the sf-unit (1,000 doc) synthetic corpus once per session."""
    from pageindex_spark.sources.corpus import ensure_scale

    return ensure_scale("sf-unit", base_dir="/root/repo/data")
