from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chyme_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "chyme_tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            # keep test-created tables (bucketing tests) out of the repo tree
            "spark.sql.warehouse.dir": "/tmp/chyme_test_warehouse",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
