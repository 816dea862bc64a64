"""JSON collection sink (`sink_json_collections`, reference
server/WriteToFile.js:5-62): round trip, empty-collection drop, single-file
parity mode, zip packaging."""

import json
import os
import zipfile

from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.sinks import (
    write_json_collections,
)


def _collections(spark):
    full = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    empty = full.filter(F.col("k") < 0)
    return {"full": full, "empty": empty}


def test_distributed_mode_drops_empty_and_round_trips(spark, tmp_path):
    out = str(tmp_path / "out")
    written = write_json_collections(_collections(spark), out)
    assert written == ["full"]
    assert not os.path.exists(os.path.join(out, "empty"))
    back = spark.read.json(os.path.join(out, "full"))
    assert sorted(r["k"] for r in back.collect()) == [0, 1, 2]


def test_single_file_parity_mode_and_zip(spark, tmp_path):
    out = str(tmp_path / "out")
    zip_path = os.path.join(out, "collections.zip")
    written = write_json_collections(
        _collections(spark), out, single_file=True, zip_path=zip_path
    )
    assert written == ["full"]
    with open(os.path.join(out, "full.json")) as fh:
        docs = json.load(fh)
    assert sorted(d["k"] for d in docs) == [0, 1, 2]
    # The zip holds the written json but never itself (reference results/
    # layout: archive lives inside the output dir).
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
    assert "full.json" in names
    assert "collections.zip" not in names


def test_partitioned_parquet_sink_prunes_splits(spark):
    """The hive-partitioned corpus layout must actually prune: a reader
    filtering one split may only touch that split's directory."""
    from pyspark.sql import functions as F

    from relational_to_doc_oriented_nosql_migrator_spark.operators.pipeline import (
        q_sink_parquet_partitioned,
    )
    from tests.conftest import SF001

    back = q_sink_parquet_partitioned(spark, SF001)
    assert back.count() > 0
    # Recover the written location from the returned frame's files.
    sample = back.select(F.input_file_name().alias("f")).first()["f"]
    base = sample.split("/split=")[0]
    pruned = spark.read.parquet(base).filter("split = 'val'")
    files = {
        r["f"]
        for r in pruned.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert files and all("split=val" in f for f in files)


def test_sink_confs_shape_document_plans(spark):
    """The sink's 1 GB heap floor depends on its scoped confs actually
    reaching physical planning (r05 verdict follow-up #7): under the
    sink context a document-heavy nesting plan must aggregate with
    SortAggregate (streams one collect_list group at a time) and join
    with ShuffledHashJoin (no sorter copies of document-sized rows) —
    and the _replanned seam must defeat QueryExecution memoization, so
    a frame the CALLER already planned still picks the sink shape."""
    import contextlib
    import io

    from relational_to_doc_oriented_nosql_migrator_spark.engine import migrate
    from relational_to_doc_oriented_nosql_migrator_spark.sinks.json_collections import (
        _replanned,
        _sort_based_collects,
    )

    def plan(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # Hermetic: an earlier test may have persisted a frame whose
    # canonical plan matches the region subtree — CacheManager would
    # then substitute an InMemoryTableScan and hide the aggregation
    # this test inspects. (At runtime that substitution is benign: a
    # user-cached collection is already materialized data, so the
    # sink's heap-shape confs have nothing left to shape.)
    spark.catalog.clearCache()
    df = migrate(spark, "/root/testdata/sf0.001")["region"]
    poisoned = plan(df)  # memoize the default (hash-agg) physical plan
    assert "ObjectHashAggregate" in poisoned
    with _sort_based_collects(spark):
        p = plan(_replanned(df))
    assert "SortAggregate" in p and "ObjectHashAggregate" not in p
    assert "ShuffledHashJoin" in p and "SortMergeJoin" not in p


def test_single_file_exempt_from_nonlocal_guard(tmp_path):
    """single_file collects to the driver and writes driver-side, so
    the bare-local-out_dir guard must NOT reject it on a non-local
    master (r11 review finding) — it fails later only if a real collect
    is attempted; here the fake df never gets that far because the
    guard is the first thing that would raise."""
    import pytest

    from relational_to_doc_oriented_nosql_migrator_spark.sinks import (
        write_json_collections,
    )

    class _Ctx:
        master = "spark://cluster:7077"

    class _Sess:
        sparkContext = _Ctx()

    class _DF:
        sparkSession = _Sess()

        def select(self, *_a):
            raise RuntimeError("reached past the guard")

    # distributed mode: guarded
    with pytest.raises(ValueError, match="scatter"):
        write_json_collections({"c": _DF()}, str(tmp_path / "o"))
    # single_file parity mode: exempt (fails later, not in the guard)
    with pytest.raises(RuntimeError, match="reached past the guard"):
        write_json_collections({"c": _DF()}, str(tmp_path / "o"),
                               single_file=True)
