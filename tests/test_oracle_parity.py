"""Replicates the driver's t2 correctness gate locally at sf0.01:
every queries() entry must match its oracle_sql() in DuckDB."""

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF001
from tests.oracle_harness import compare, duckdb_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF001)
    yield c
    c.close()


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    missing_oracles = set(QUERIES) - set(ORACLES)
    # Every registered query is oracle-checked as of round 2.
    assert not missing_oracles, missing_oracles


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_parity(qid, spark, con):
    df = QUERIES[qid](spark, SF001)
    problems = compare(df, con, ORACLES[qid])
    assert not problems, f"{qid}: " + "; ".join(problems)


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(qid, spark):
    df = QUERIES[qid](spark, SF001)
    assert df.count() >= 0
