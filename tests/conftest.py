"""Shared fixtures (the analog of test_tipc/prepare.sh staging)."""

from __future__ import annotations

import pytest

TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    from webextract.session import get_spark

    s = get_spark(app="webextract-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
