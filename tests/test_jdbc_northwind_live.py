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

Without the env vars the module skips cleanly.
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

# Parents before children so FK targets exist at CREATE time.
TOPO_ORDER = [
    "category", "supplier", "region", "shipper", "customer", "employee",
    "product", "territory", "salesorder", "employeeterritory",
    "orderdetail",
]

_SQL_TYPES = {"int": "INT", "double": "DOUBLE"}


def _sql_type(name: str, col: str, typ: str, key_cols: set) -> str:
    if typ in _SQL_TYPES:
        return _SQL_TYPES[typ]
    # MySQL cannot index TEXT without a prefix length: key-participating
    # strings become VARCHAR; free text (notes/description/picture) TEXT.
    return "VARCHAR(64)" if col in key_cols else "TEXT"


def _esc(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def northwind_dump() -> str:
    """MySQL-dialect dump of the reconstructed Northwind fixture."""
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
            f"`{col}` {_sql_type(name, col, typ, key_cols)}"
            for col, typ in fields
        ]
        cons = [
            "PRIMARY KEY (" + ", ".join(
                f"`{c}`" for c in meta.primary_keys
            ) + ")"
        ]
        cons += [
            f"CONSTRAINT fk_{name}_{fk.column} FOREIGN KEY (`{fk.column}`)"
            f" REFERENCES `{fk.referenced_table}` (`{fk.referenced_column}`)"
            for fk in meta.foreign_keys
        ]
        stmts.append(
            f"CREATE TABLE `{name}` (\n  "
            + ",\n  ".join(cols + cons)
            + "\n);"
        )
        col_names = [f[0] for f in fields]
        rows = base[name]
        for i in range(0, len(rows), 200):
            values = ",\n".join(
                "(" + ", ".join(_esc(r.get(c)) for c in col_names) + ")"
                for r in rows[i:i + 200]
            )
            stmts.append(
                f"INSERT INTO `{name}` ("
                + ", ".join(f"`{c}`" for c in col_names)
                + f") VALUES\n{values};"
            )
    return "\n".join(stmts)


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
        for name in reversed(TOPO_ORDER):
            try:
                st.execute(f"DROP TABLE `{name}`")
            except Exception:  # noqa: BLE001 — absent on first run
                pass
        for stmt in dump.split(";\n"):
            if stmt.strip():
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
