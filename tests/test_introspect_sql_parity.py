"""Golden parity: the introspection SQL strings the JDBC path ships must
equal (normalized) the SQL the reference actually sends per endpoint —
extracted from the reference JS at test time, so drift in either side
fails loudly. Skips when the reference checkout is absent."""

import pathlib
import re

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.sources.introspect import (
    REFERENCE_SQL,
    normalize_sql,
)

REF = pathlib.Path("/root/reference/server")
FILES = {"mysql": "MySQLDBManager.js", "postgres": "PostgresDBManager.js"}
ENDPOINTS = {
    "getTableData": "table_data",
    "getTableRows": "table_rows",
    "getTableColumns": "table_columns",
    "getPrimaryKeys": "primary_keys",
    "getForeignKeys": "foreign_keys",
    "getReferenceInfo": "reference_info",
}
_METHOD_QUERY = re.compile(
    r"async (\w+)\([^)]*\) \{\s*try \{\s*const query = `([^`]*)`", re.S
)


def _reference_queries(js_name):
    src = (REF / js_name).read_text()
    out = {}
    for method, sql in _METHOD_QUERY.findall(src):
        if method in ENDPOINTS:
            sql = sql.replace("${databaseName}", "{db}")
            sql = sql.replace("${tableName}", "{table}")
            out[ENDPOINTS[method]] = normalize_sql(sql)
    return out


@pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")
@pytest.mark.parametrize("dialect", sorted(FILES))
def test_reference_sql_text_parity(dialect):
    theirs = _reference_queries(FILES[dialect])
    ours = {k: normalize_sql(v) for k, v in REFERENCE_SQL[dialect].items()}
    assert set(theirs) == set(ours), "endpoint inventory drifted"
    for endpoint in sorted(theirs):
        assert ours[endpoint] == theirs[endpoint], (
            f"{dialect}.{endpoint} SQL text drifted from the reference"
        )


def test_normalize_strips_terminator_and_whitespace():
    assert normalize_sql("SELECT  1\n  FROM t;\n") == "SELECT 1 FROM t"
