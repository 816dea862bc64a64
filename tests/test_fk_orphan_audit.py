"""Planted-orphan proof for ext_fk_orphan_audit: the shipped testdata has
intact referential integrity (every edge reports 0 orphans — itself the
assertion a migration pre-flight wants), so this test plants broken FKs in
a synthetic catalog and asserts the counter actually counts them."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    relational as R,
)

from tests.conftest import SF001


@pytest.fixture(scope="module")
def orphan_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("orphan_cat"))

    def write(name, cols):
        pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))

    write("nation", {"n_nationkey": pa.array([0, 1], type=pa.int32()),
                     "n_name": ["A", "B"]})
    # customer 3 points at nation 9 (orphan); customer 1, 2 intact.
    write("customer", {"c_custkey": pa.array([1, 2, 3], type=pa.int64()),
                       "c_nationkey": pa.array([0, 1, 9],
                                               type=pa.int32())})
    # supplier intact.
    write("supplier", {"s_suppkey": pa.array([1], type=pa.int64()),
                       "s_nationkey": pa.array([0], type=pa.int32())})
    # orders 101/102 OK, 103 and 104 point at missing customers.
    write("orders", {"o_orderkey": pa.array([101, 102, 103, 104],
                                            type=pa.int64()),
                     "o_custkey": pa.array([1, 2, 7, 8],
                                           type=pa.int64())})
    # lineitem: one orphan (order 999).
    write("lineitem", {"l_orderkey": pa.array([101, 102, 999],
                                              type=pa.int64()),
                       "l_linenumber": pa.array([1, 1, 1],
                                                type=pa.int32())})
    return out


def test_planted_orphans_counted(spark, orphan_dir):
    rows = {
        (r.child_table, r.fk_column): (r.n_rows, r.n_orphans)
        for r in R.q_ext_fk_orphan_audit(spark, orphan_dir).collect()
    }
    assert rows[("orders", "o_custkey")] == (4, 2)
    assert rows[("lineitem", "l_orderkey")] == (3, 1)
    assert rows[("customer", "c_nationkey")] == (3, 1)
    assert rows[("supplier", "s_nationkey")] == (1, 0)


def test_shipped_testdata_is_intact(spark):
    audit = R.q_ext_fk_orphan_audit(spark, SF001).collect()
    assert len(audit) == len(R.FK_AUDIT_EDGES)
    assert all(r.n_orphans == 0 for r in audit)
    assert all(r.n_rows > 0 for r in audit)
