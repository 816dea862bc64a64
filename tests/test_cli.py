"""CLI / `migrate_from_dump`: the reference's POST /migration workflow as a
batch entry point — dump (+ optional query log) in, JSON collections out."""

import json
import os

from relational_to_doc_oriented_nosql_migrator_spark.engine import (
    migrate_from_dump,
)
from relational_to_doc_oriented_nosql_migrator_spark.operators.relational import (
    DUMP_FIXTURE,
)


def test_migrate_from_dump_nests_employee_into_dept(spark):
    out = migrate_from_dump(spark, DUMP_FIXTURE)
    assert set(out) == {"dept"}
    docs = {r["id"]: r.asDict(recursive=True) for r in out["dept"].collect()}
    emp_names = {e["emp_name"] for e in (docs[1]["employee"] or [])}
    assert emp_names == {"ada", "alan"}


def test_migrate_from_dump_applies_workload(spark):
    # A write-hot log against dept flips the planner away from embedding
    # everything idle-style; the pipeline must still produce collections.
    log = "2024-01-02T10:00:00.000000Z\t8 Query\tSELECT * FROM employee"
    out = migrate_from_dump(spark, DUMP_FIXTURE, log_content=log)
    assert out  # workload path exercised end to end


def test_cli_dump_to_json_dir(spark, tmp_path):
    from relational_to_doc_oriented_nosql_migrator_spark import cli

    dump = tmp_path / "mini.sql"
    dump.write_text(DUMP_FIXTURE)
    out_dir = tmp_path / "out"
    rc = cli.main(
        ["--dump", str(dump), "--out", str(out_dir), "--single-file"]
    )
    assert rc == 0
    files = os.listdir(out_dir)
    assert "dept.json" in files
    docs = json.loads((out_dir / "dept.json").read_text())
    assert len(docs) == 3 and any(d.get("employee") for d in docs)


def test_cli_parquet_tables_to_json_dir(spark, tmp_path):
    from relational_to_doc_oriented_nosql_migrator_spark import cli
    from tests.conftest import SF0001

    out_dir = tmp_path / "out"
    rc = cli.main(["--tables", SF0001, "--out", str(out_dir)])
    assert rc == 0
    written = set(os.listdir(out_dir))
    # The TPC-H plan's roots: region nest + standalone collections.
    assert {"region", "part", "lineitem"} <= written
