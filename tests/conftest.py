from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from lazyosm_spark import get_spark

    s = get_spark(
        app="tests",
        cpus=8,
        driver_memory="8g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def fx(spark):
    from lazyosm_spark.sources.fixtures import load_fixtures

    return load_fixtures(spark, "tiny")
