from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def pytest_configure(config):
    # fast/full split (VERDICT r6 #7): `pytest -m "not slow"` is the quick
    # correctness-gate subset; the default (full) run is unchanged.  A test
    # is `slow` when it spawns extra JVM processes or drives multi-minute
    # e2e loops — nothing is ever excluded from the full run.
    config.addinivalue_line(
        "markers", "slow: multi-minute e2e/subprocess tests (full run only)"
    )


@pytest.fixture(scope="session")
def spark():
    from kupo_spark.session import get_spark

    s = get_spark("kupo-tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def index(spark):
    from kupo_spark.context import get_index

    return get_index(spark, SF_DIR)


@pytest.fixture(scope="session")
def blocks(spark):
    from kupo_spark.context import get_blocks

    return get_blocks(spark, SF_DIR)
