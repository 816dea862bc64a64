"""SQL-dump import (`src_sql_dump_import`): parsing, sanitization parity,
catalog metadata, and end-to-end migration from dump input."""

from relational_to_doc_oriented_nosql_migrator_spark.operators.relational import (
    DUMP_FIXTURE,
)
from relational_to_doc_oriented_nosql_migrator_spark.plans import (
    convert_schema,
    materialize,
)
from relational_to_doc_oriented_nosql_migrator_spark.sources.sqldump import (
    import_sql_dump,
)


def test_dump_tables_and_values(spark):
    db, tables, catalog = import_sql_dump(spark, DUMP_FIXTURE)
    assert db == "northlite"  # from USE, not the fallback
    assert set(tables) == {"dept", "employee"}
    dept = {r["id"]: r for r in tables["dept"].collect()}
    assert dept[1]["budget"] == 100.50
    assert dept[3]["budget"] is None and dept[3]["est"] is None
    assert str(dept[2]["est"]) == "2024-03-04"
    assert tables["employee"].count() == 3


def test_dump_catalog_metadata(spark):
    _, _, catalog = import_sql_dump(spark, DUMP_FIXTURE)
    dept = catalog.get_table("dept")
    emp = catalog.get_table("employee")
    assert dept.primary_keys == ["id"]          # inline PRIMARY KEY
    assert emp.primary_keys == ["emp_id"]       # constraint PRIMARY KEY
    assert [(fk.column, fk.referenced_table, fk.referenced_column)
            for fk in emp.foreign_keys] == [("dept_id", "dept", "id")]
    assert dept.is_referenced and dept.referencing_tables == ["employee"]
    assert dept.num_rows == 3 and emp.num_rows == 3


def test_dump_sanitization(spark):
    """DROP/CREATE DATABASE and comment/meta lines never become tables."""
    dump = """\\c somedb
DROP DATABASE x;
CREATE DATABASE y;
CREATE TABLE t (a INT);
INSERT INTO t VALUES (7);
"""
    db, tables, _ = import_sql_dump(spark, dump, default_db="fallback")
    assert db == "fallback"
    assert set(tables) == {"t"}
    assert tables["t"].collect()[0]["a"] == 7


def test_dump_drives_full_migration(spark):
    """The dump-derived catalog feeds the planner/materializer unchanged:
    employee (1 FK, idle workload) one-way-embeds into dept."""
    _, tables, catalog = import_sql_dump(spark, DUMP_FIXTURE)
    plan = convert_schema(catalog)
    collections = materialize(tables, catalog, plan)
    assert set(collections) == {"dept"}
    docs = {r["id"]: r for r in collections["dept"].collect()}
    # dept 1 embeds its two employees; the child FK column is dropped.
    emb = sorted(e["emp_name"] for e in docs[1]["employee"])
    assert emb == ["ada", "alan"]
    assert "dept_id" not in docs[1]["employee"][0].asDict()


PG_COPY_DUMP = """\\c pgdb
SET statement_timeout = 0;
CREATE TABLE dept (
  id INT,
  name VARCHAR(50),
  budget NUMERIC(10,2),
  est DATE,
  PRIMARY KEY (id)
);
CREATE TABLE employee (
  emp_id INT PRIMARY KEY,
  dept_id INT,
  emp_name VARCHAR(80),
  hired TIMESTAMP,
  active BOOLEAN,
  FOREIGN KEY (dept_id) REFERENCES dept (id)
);
COPY dept (id, name, budget, est) FROM stdin;
1\teng\t100.50\t2024-01-02
2\tops\t20.25\t2024-03-04
3\thr\t\\N\t\\N
\\.
COPY employee FROM stdin;
10\t1\tada\t2024-01-02 10:00:00\tt
11\t1\talan lo\\\\vell\t2024-02-03 11:30:00\tf
12\t2\trosa\t\\N\tt
\\.
"""


def test_pg_copy_blocks(spark):
    """pg_dump COPY ... FROM stdin data blocks: tab framing, \\N nulls,
    backslash escapes, with and without an explicit column list."""
    db, tables, catalog = import_sql_dump(spark, PG_COPY_DUMP,
                                          default_db="pgdb")
    dept = {r["id"]: r for r in tables["dept"].collect()}
    assert dept[1]["budget"] == 100.50 and str(dept[2]["est"]) == "2024-03-04"
    assert dept[3]["budget"] is None and dept[3]["est"] is None
    emp = {r["emp_id"]: r for r in tables["employee"].collect()}
    assert emp[11]["emp_name"] == "alan lo\\vell"   # unescaped backslash
    assert emp[10]["active"] is True and emp[11]["active"] is False
    assert str(emp[10]["hired"]).startswith("2024-01-02 10:00:00")
    assert emp[12]["hired"] is None
    assert catalog.get_table("dept").num_rows == 3
    assert [(fk.column, fk.referenced_table)
            for fk in catalog.get_table("employee").foreign_keys] == [
        ("dept_id", "dept")
    ]


def test_pg_copy_drives_full_migration(spark):
    from relational_to_doc_oriented_nosql_migrator_spark.engine import (
        migrate_from_dump,
    )

    out = migrate_from_dump(spark, PG_COPY_DUMP)
    docs = {r["id"]: r.asDict(recursive=True) for r in out["dept"].collect()}
    assert {e["emp_name"] for e in docs[1]["employee"]} == {
        "ada", "alan lo\\vell"
    }


def test_escaped_quotes_with_separators_inside_strings(spark):
    """mysqldump backslash escapes: \\' inside a literal must not close the
    quote, so ';' and ',' inside the string never split the statement or
    the VALUES tuple."""
    dump = r"""CREATE TABLE t (a INT, b VARCHAR(100), c VARCHAR(100));
INSERT INTO t VALUES (1, 'it\'s; tricky', 'x'), (2, 'a\'b, c\'d', 'y\\');
INSERT INTO t VALUES (3, 'plain', 'z');
"""
    _, tables, _ = import_sql_dump(spark, dump)
    rows = {r["a"]: r for r in tables["t"].collect()}
    assert rows[1]["b"] == "it's; tricky" and rows[1]["c"] == "x"
    assert rows[2]["b"] == "a'b, c'd" and rows[2]["c"] == "y\\"
    assert rows[3]["b"] == "plain"
