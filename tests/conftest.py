from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_realtime_changefeed_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE


def pytest_collection_modifyitems(config, items):
    """Apply the measured `slow` marks (tests/slow_marks.py): the
    driver's verify gate has a ~30-minute budget and the full suite
    runs 45+ minutes, so the measured-slow tests are excluded from
    the default run by pytest.ini's `-m "not slow"` and run in round
    certification instead (`pytest tests/ -m slow`)."""
    from .slow_marks import SLOW_TESTS

    rootdir = str(config.rootpath)
    for item in items:
        nodeid = os.path.relpath(item.fspath, rootdir).replace(
            os.sep, "/") + "::" + item.nodeid.split("::", 1)[1]
        if nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
