from __future__ import annotations

import pytest

from kgtm.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kgtm-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def duck_docs(parquet_docs: str | None = None, planted=None):
    """DuckDB connection with a `documents` view over either a parquet dir
    or a planted pandas frame — the shared oracle-twin harness for the
    data-prep operator tests (one definition; test modules import it)."""
    import duckdb

    con = duckdb.connect()
    if parquet_docs is not None:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{parquet_docs}/documents.parquet')"
        )
    if planted is not None:
        con.register("planted_df", planted)
        con.execute("CREATE VIEW documents AS SELECT * FROM planted_df")
    return con
