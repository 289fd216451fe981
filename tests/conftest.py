from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
# Export the choice BEFORE the query registry loads: oracles that pin
# data-derived literals (queries/similarity.py centroid artifacts)
# must be built against the same corpus the oracle views read.
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_ORACLE


@pytest.fixture(scope="session")
def spark():
    from ella_spark.session import get_session

    s = get_session("ella_spark_tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
