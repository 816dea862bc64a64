"""Opt-in FULL end-to-end live-MySQL parity on the Northwind fixture
(r05 verdict follow-up #6): the reference's actual `POST /migration`
path (reference server/index.js:33-43) is dump-or-live-DB in, nested
JSON collections out. This test runs BOTH paths on the same data and
asserts document-value equality through the real JSON sink:

  dump text ──────────────► migrate_from_dump ──► sink ──┐
                                                          ├─ equal docs
  dump text ─► live MySQL ─► migrate_from_jdbc ─► sink ──┘

The dump is GENERATED from the reconstructed Northwind base tables
(tests/northwind_golden.py inverts the reference's checked-in golden
output), with table-level FOREIGN KEY clauses — MySQL parses but
silently IGNORES inline column REFERENCES — and mysqldump-style \\'
escaping, which sources/sqldump.py and the MySQL server read
identically.

Opt in with a DEDICATED scratch database (migrate_from_jdbc migrates
every table it finds; this test creates and drops the 11 Northwind
tables):

    SPARKGRAFT_MYSQL_URL='jdbc:mysql://host:3306/db?user=u&password=p' \
    SPARKGRAFT_MYSQL_DB='db' pytest tests/test_jdbc_northwind_live.py

The Postgres twin (r06 verdict task #5 — the reference's full PG path,
reference server/PostgresDBManager.js:41-327) runs the same loop against
a live PG schema with PG-dialect statements:

    SPARKGRAFT_PG_URL='jdbc:postgresql://host/db?user=u&password=p' \
    pytest tests/test_jdbc_northwind_live.py   # SPARKGRAFT_PG_SCHEMA opt.

Without the env vars the live halves skip cleanly.
"""

import json
import os

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.engine import (
    migrate_from_dump,
    migrate_from_jdbc,
)
from relational_to_doc_oriented_nosql_migrator_spark.plans import (
    northwind_catalog,
)
from relational_to_doc_oriented_nosql_migrator_spark.sinks import (
    write_json_collections,
)
from tests.northwind_golden import (
    SCHEMAS,
    invert_golden,
    load_golden,
    normalize_doc,
)

MYSQL_URL = os.environ.get("SPARKGRAFT_MYSQL_URL")
MYSQL_DB = os.environ.get("SPARKGRAFT_MYSQL_DB")
PG_URL = os.environ.get("SPARKGRAFT_PG_URL")
PG_SCHEMA = os.environ.get("SPARKGRAFT_PG_SCHEMA", "public")

# Parents before children so FK targets exist at CREATE time.
TOPO_ORDER = [
    "category", "supplier", "region", "shipper", "customer", "employee",
    "product", "territory", "salesorder", "employeeterritory",
    "orderdetail",
]

_SQL_TYPES = {
    "mysql": {"int": "INT", "double": "DOUBLE"},
    "postgres": {"int": "INT", "double": "DOUBLE PRECISION"},
}
_QUOTE = {"mysql": "`", "postgres": '"'}


def _sql_type(dialect: str, col: str, typ: str, key_cols: set) -> str:
    if typ in _SQL_TYPES[dialect]:
        return _SQL_TYPES[dialect][typ]
    # MySQL cannot index TEXT without a prefix length: key-participating
    # strings become VARCHAR; free text (notes/description/picture) TEXT.
    return "VARCHAR(64)" if col in key_cols else "TEXT"


def _esc(v, dialect: str = "mysql") -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v)
    if dialect == "postgres":
        # standard_conforming_strings (PG default): backslashes are
        # literal, only quotes double.
        return "'" + s.replace("'", "''") + "'"
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def northwind_statements(dialect: str = "mysql") -> list:
    """CREATE/INSERT statements (no trailing ';') for the reconstructed
    Northwind fixture, in FK-topological order. Returned as a LIST so
    live tests execute statements directly instead of re-splitting the
    joined dump text (r06 ADVICE: splitting on ';\\n' breaks if an
    escaped value contains that byte sequence)."""
    q = _QUOTE[dialect]

    def ident(n: str) -> str:
        return q + n + q

    base = invert_golden(load_golden())
    catalog = northwind_catalog({k: len(v) for k, v in base.items()})
    stmts = []
    for name in TOPO_ORDER:
        meta = catalog.get_table(name)
        key_cols = set(meta.primary_keys) | {
            fk.column for fk in meta.foreign_keys
        }
        for t in catalog.tables.values():
            key_cols |= {
                fk.referenced_column
                for fk in t.foreign_keys
                if fk.referenced_table == name
            }
        fields = [c.strip().split(" ") for c in SCHEMAS[name].split(",")]
        cols = [
            f"{ident(col)} {_sql_type(dialect, col, typ, key_cols)}"
            for col, typ in fields
        ]
        cons = [
            "PRIMARY KEY (" + ", ".join(
                ident(c) for c in meta.primary_keys
            ) + ")"
        ]
        cons += [
            f"CONSTRAINT fk_{name}_{fk.column} FOREIGN KEY ({ident(fk.column)})"
            f" REFERENCES {ident(fk.referenced_table)} ({ident(fk.referenced_column)})"
            for fk in meta.foreign_keys
        ]
        stmts.append(
            f"CREATE TABLE {ident(name)} (\n  "
            + ",\n  ".join(cols + cons)
            + "\n)"
        )
        col_names = [f[0] for f in fields]
        rows = base[name]
        for i in range(0, len(rows), 200):
            values = ",\n".join(
                "(" + ", ".join(
                    _esc(r.get(c), dialect) for c in col_names
                ) + ")"
                for r in rows[i:i + 200]
            )
            stmts.append(
                f"INSERT INTO {ident(name)} ("
                + ", ".join(ident(c) for c in col_names)
                + f") VALUES\n{values}"
            )
    return stmts


def northwind_dump() -> str:
    """MySQL-dialect dump text of the reconstructed Northwind fixture
    (what sources/sqldump.py parses — byte-identical to the pre-refactor
    rendering)."""
    return "\n".join(s + ";" for s in northwind_statements("mysql"))


def _collections_to_docs(spark, collections, out_dir) -> dict:
    """Materialize through the real JSON sink and read the docs back —
    the same byte path a user of `POST /migration` receives."""
    written = write_json_collections(
        collections, out_dir, single_file=True
    )
    out = {}
    for name in written:
        with open(os.path.join(out_dir, f"{name}.json")) as fh:
            out[name.lower()] = sorted(
                (normalize_doc(d) for d in json.load(fh)),
                key=lambda d: json.dumps(d, sort_keys=True, default=str),
            )
    return out


def test_dump_text_parses_and_migrates(spark, tmp_path):
    """Sandbox-runnable half of the loop: the generated dump drives the
    reference's dump entry point end to end through the JSON sink (the
    live half reuses the identical dump text)."""
    dump = northwind_dump()
    collections = migrate_from_dump(spark, dump, normalize_dates=False)
    docs = _collections_to_docs(spark, collections, str(tmp_path / "a"))
    # The normative planner fully embeds the child tables: the roots are
    # the six reference-free tables, one doc per base row.
    expected = {
        "category": 8, "customer": 91, "employee": 9,
        "region": 4, "shipper": 3, "supplier": 29,
    }
    assert {k: len(v) for k, v in docs.items()} == expected


@pytest.mark.skipif(
    not (MYSQL_URL and MYSQL_DB),
    reason="set SPARKGRAFT_MYSQL_URL + SPARKGRAFT_MYSQL_DB (dedicated"
           " scratch database) for the live Northwind end-to-end",
)
def test_live_mysql_matches_dump_path(spark, tmp_path):
    try:
        conn = spark._jvm.java.sql.DriverManager.getConnection(MYSQL_URL)
    except Exception as exc:  # noqa: BLE001 — Py4J wraps JDBC errors
        pytest.skip(f"cannot connect: {exc}")
    dump = northwind_dump()
    st = conn.createStatement()
    try:
        # Pin the session sql_mode: the generated dump uses mysqldump's
        # \' escaping, which a server running NO_BACKSLASH_ESCAPES would
        # read literally (r06 ADVICE).
        st.execute("SET SESSION sql_mode = ''")
        for name in reversed(TOPO_ORDER):
            try:
                st.execute(f"DROP TABLE `{name}`")
            except Exception:  # noqa: BLE001 — absent on first run
                pass
        # Execute the statement LIST — never re-split the dump text
        # (values may legally contain ';\n').
        for stmt in northwind_statements("mysql"):
            st.execute(stmt)
        live = migrate_from_jdbc(
            spark, MYSQL_URL, schema=MYSQL_DB, normalize_dates=False
        )
        live_docs = _collections_to_docs(
            spark, live, str(tmp_path / "live")
        )
        local = migrate_from_dump(spark, dump, normalize_dates=False)
        local_docs = _collections_to_docs(
            spark, local, str(tmp_path / "local")
        )
        assert set(live_docs) == set(local_docs)
        for name in local_docs:
            assert live_docs[name] == local_docs[name], (
                f"collection {name} diverges between the live-MySQL and"
                " dump paths"
            )
    finally:
        for name in reversed(TOPO_ORDER):
            try:
                st.execute(f"DROP TABLE `{name}`")
            except Exception:  # noqa: BLE001
                pass
        st.close()
        conn.close()


def test_postgres_dialect_statements_render():
    """Sandbox half of the PG twin: the PG-dialect statement rendering
    must carry no MySQL-isms (backticks, backslash escapes, DOUBLE) —
    the statements a live PG server executes in the opt-in test."""
    stmts = northwind_statements("postgres")
    assert len(stmts) == len(northwind_statements("mysql"))
    joined = "\n".join(stmts)
    assert "`" not in joined
    assert "\\'" not in joined
    assert " DOUBLE PRECISION" in joined
    assert " DOUBLE," not in joined and " DOUBLE\n" not in joined
    # quote doubling, not backslash escaping, for embedded quotes
    assert "''" in joined


@pytest.mark.skipif(
    not PG_URL,
    reason="set SPARKGRAFT_PG_URL (dedicated scratch database/schema)"
           " for the live Postgres Northwind end-to-end"
           " (optional SPARKGRAFT_PG_SCHEMA, default 'public')",
)
def test_live_postgres_matches_dump_path(spark, tmp_path):
    """PG twin of the live-MySQL end-to-end (r06 verdict task #5): the
    reference's full Postgres path (reference server/PostgresDBManager.js:
    41-327, pg_catalog introspection) — load the fixture into a live PG
    schema, run migrate_from_jdbc (JDBC metadata introspection +
    partitioned reads), and assert the sunk document values equal the
    dump path's byte for byte."""
    try:
        conn = spark._jvm.java.sql.DriverManager.getConnection(PG_URL)
    except Exception as exc:  # noqa: BLE001 — Py4J wraps JDBC errors
        pytest.skip(f"cannot connect: {exc}")
    st = conn.createStatement()
    try:
        for name in reversed(TOPO_ORDER):
            try:
                st.execute(f'DROP TABLE "{name}" CASCADE')
            except Exception:  # noqa: BLE001 — absent on first run
                pass
        for stmt in northwind_statements("postgres"):
            st.execute(stmt)
        live = migrate_from_jdbc(
            spark, PG_URL, schema=PG_SCHEMA, normalize_dates=False
        )
        live_docs = _collections_to_docs(
            spark, live, str(tmp_path / "live_pg")
        )
        local = migrate_from_dump(
            spark, northwind_dump(), normalize_dates=False
        )
        local_docs = _collections_to_docs(
            spark, local, str(tmp_path / "local")
        )
        assert set(live_docs) == set(local_docs)
        for name in local_docs:
            assert live_docs[name] == local_docs[name], (
                f"collection {name} diverges between the live-Postgres"
                " and dump paths"
            )
    finally:
        for name in reversed(TOPO_ORDER):
            try:
                st.execute(f'DROP TABLE "{name}" CASCADE')
            except Exception:  # noqa: BLE001
                pass
        st.close()
        conn.close()
