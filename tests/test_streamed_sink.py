"""Per-root streamed JSON assembly for heavy roots (r08 verdict #2).

Materializing a root document as one row has an inherent heap floor of
|subtree|/|roots| (a region at the 100x dataset is a ~420 MB single row,
then a comparably-sized JSON string in one write task). Past
nesting.HEAVY_ROOT_SUBTREE_ROWS the sink assembles such roots in FILE
space: the heavy child's documents are written as per-root sorted JSON
fragments and the root NDJSON line is stitched by streaming
concatenation. These tests force the threshold to 0 at sf0.001 and pin
that the streamed output is PARSE-IDENTICAL to the distributed writer's
(same docs, same field presence, same array order), so the sf10 path is
value-proven at test scale.
"""

import os

import pytest

from relational_to_doc_oriented_nosql_migrator_spark.engine import (
    build_testdata_catalog,
    migrate_streamed,
)
from relational_to_doc_oriented_nosql_migrator_spark.plans import convert_schema
from relational_to_doc_oriented_nosql_migrator_spark.plans.nesting import (
    stream_plan,
)
from relational_to_doc_oriented_nosql_migrator_spark.sinks import (
    write_json_collections,
)
from tests.conftest import SF0001


def test_stream_plan_thresholds(spark):
    """Only tiny-cardinality roots with a past-threshold subtree stream;
    at the default threshold nothing streams below the probe corpus, so
    the recorded bench/sweep plans are untouched."""
    catalog, _tables = build_testdata_catalog(spark, SF0001)
    plan = convert_schema(catalog)
    assert stream_plan(catalog, plan) == {}
    forced = stream_plan(catalog, plan, threshold=0)
    # region is the only root with embedded children in the tpch plan;
    # its heaviest child is the nation subtree.
    assert forced == {"region": "nation"}


@pytest.fixture(scope="module")
def both_outputs(spark, tmp_path_factory):
    # threshold=0 engages the DEEPEST path: region streams AND the
    # nation level recurses (customer is the heavy grandchild), so this
    # parity fixture covers the exact mode the sf10 probe runs.
    collections, streamed = migrate_streamed(spark, SF0001, threshold=0)
    assert set(streamed) == {"region"}
    assert streamed["region"].child_rows is None  # two-level engaged
    assert streamed["region"].grandchild_name == "customer"
    normal_dir = str(tmp_path_factory.mktemp("sink_normal"))
    stream_dir = str(tmp_path_factory.mktemp("sink_streamed"))
    wrote_normal = write_json_collections(collections, normal_dir)
    wrote_streamed = write_json_collections(
        collections, stream_dir, streamed=streamed
    )
    return collections, normal_dir, stream_dir, wrote_normal, wrote_streamed


def test_streamed_writes_same_collections(both_outputs):
    _c, _n, stream_dir, wrote_normal, wrote_streamed = both_outputs
    assert sorted(wrote_normal) == sorted(wrote_streamed)
    assert os.path.exists(
        os.path.join(stream_dir, "region", "part-00000.json")
    )


def test_streamed_region_parses_identical(spark, both_outputs):
    """Schema-guided read-back of the streamed NDJSON must yield the
    SAME parsed documents as the distributed writer's — toJSON
    round-trip compares nested content including embedded-array order
    (array_sort order on both paths)."""
    collections, normal_dir, stream_dir, _w, _w2 = both_outputs
    schema = collections["region"].schema
    normal = sorted(
        spark.read.schema(schema)
        .json(os.path.join(normal_dir, "region"))
        .toJSON()
        .collect()
    )
    streamed = sorted(
        spark.read.schema(schema)
        .json(os.path.join(stream_dir, "region"))
        .toJSON()
        .collect()
    )
    assert len(normal) == 5
    assert normal == streamed
    # _corrupt_record would surface as nulls everywhere under a strict
    # schema; make the non-degeneracy explicit:
    assert all('"nation":[' in line for line in streamed)


def test_single_level_mode_parses_identical(spark, both_outputs, tmp_path):
    """SINGLE-LEVEL mode (child documents materialized as rows, only the
    root split) must also parse identically — this is the shape for a
    heavy root whose child level is NOT itself a hazard (large child
    cardinality or small grandchild subtrees). Forced by streaming the
    root at threshold 0 while the recursion threshold stays high."""
    from relational_to_doc_oriented_nosql_migrator_spark.plans.nesting import (
        materialize_streamed_root,
    )

    collections, normal_dir, _s, _w, _w2 = both_outputs
    catalog, tables = build_testdata_catalog(spark, SF0001)
    plan = convert_schema(catalog)
    pieces = materialize_streamed_root(
        tables, catalog, plan, "region", "nation", threshold=10**9
    )
    assert pieces.child_rows is not None  # single-level shape
    out = str(tmp_path / "single")
    wrote = write_json_collections(
        {"region": collections["region"]}, out, streamed={"region": pieces}
    )
    assert wrote == ["region"]
    schema = collections["region"].schema
    normal = sorted(
        spark.read.schema(schema)
        .json(os.path.join(normal_dir, "region"))
        .toJSON()
        .collect()
    )
    single = sorted(
        spark.read.schema(schema)
        .json(os.path.join(out, "region"))
        .toJSON()
        .collect()
    )
    assert single == normal


def test_streamed_assembly_exotic_keys(spark, tmp_path):
    """The canonical key encoding (nesting._stream_key) must survive key
    values Python str() would mis-render against Spark's partition-dir
    naming — booleans, strings with spaces/tabs/percent signs, empty
    strings — and NULL child keys must yield an omitted grandchild
    array, not a corrupted fragment line (r09 deferred findings #1/#2).
    Built directly at the StreamedRoot seam: the frames are plain
    DataFrames, so the sink contract is testable without a catalog."""
    import json as _json

    from pyspark.sql import functions as F

    from relational_to_doc_oriented_nosql_migrator_spark.plans.nesting import (
        NULL_KEY_SENTINEL,
        StreamedRoot,
        _stream_key,
    )

    keys = ["plain", "with space", "with\ttab", "100%", "", "True"]
    roots = spark.createDataFrame(
        [(k, '{"root_key":%s}' % _json.dumps(k), "{}") for k in keys],
        "raw string, __left string, __right string",
    ).select(
        _stream_key(F.col("raw")).alias("__fk"), "__left", "__right"
    )
    # two children per root, one grandchild under the FIRST child of
    # each root, none under the second; one fragment with a NULL child
    # key (sentinel path).
    frag_rows = []
    for k in keys:
        frag_rows.append((k, f"{k}/c0", '{"cid":0}'))
        frag_rows.append((k, None, '{"cid":1}'))
    frags = spark.createDataFrame(
        frag_rows, "rfk string, ck string, body string"
    ).select(
        _stream_key(F.col("rfk")).alias("__fk"),
        F.coalesce(_stream_key(F.col("ck")),
                   F.lit(NULL_KEY_SENTINEL)).alias("__k"),
        F.struct(F.get_json_object("body", "$.cid").cast("int")
                 .alias("cid")).alias("__stl"),
        F.struct(F.lit(None).alias("__none")).alias("__str"),
    )
    grands = spark.createDataFrame(
        [(f"{k}/c0", i) for k in keys for i in range(2)],
        "gk string, gval int",
    ).select(
        _stream_key(F.col("gk")).alias("__k"),
        F.struct(F.col("gval")).alias("__st"),
    )
    pieces = StreamedRoot(
        roots=roots, child_name="children", child_rows=None,
        grandchild_name="grand", child_fragments=frags,
        grandchild_rows=grands,
    )
    from relational_to_doc_oriented_nosql_migrator_spark.sinks.json_collections import (
        _write_streamed,
    )

    target = str(tmp_path / "exotic")
    assert _write_streamed(pieces, target)
    docs = [
        _json.loads(line)
        for line in open(os.path.join(target, "part-00000.json"))
    ]
    assert len(docs) == len(keys)
    by_key = {d["root_key"]: d for d in docs}
    assert set(by_key) == set(keys)   # every exotic key matched its dir
    for k in keys:
        kids = by_key[k]["children"]
        assert len(kids) == 2
        with_g = [c for c in kids if "grand" in c]
        without_g = [c for c in kids if "grand" not in c]
        assert len(with_g) == 1 and len(without_g) == 1
        assert [g["gval"] for g in with_g[0]["grand"]] == [0, 1]


def test_streamed_empty_root_skipped(spark, both_outputs):
    """filter_nonempty_collection semantics survive streaming: a root
    frame with zero rows writes nothing and is not reported."""
    collections, _n, _s, _w, _w2 = both_outputs
    _colls, streamed = migrate_streamed(spark, SF0001, threshold=0)
    pieces = streamed["region"]
    pieces.roots = pieces.roots.filter("1 = 0")
    out = str(
        __import__("tempfile").mkdtemp(prefix="sink_streamed_empty_")
    )
    try:
        wrote = write_json_collections(
            {"region": collections["region"]}, out, streamed={"region": pieces}
        )
        assert "region" not in wrote
        assert not os.path.exists(os.path.join(out, "region"))
    finally:
        __import__("shutil").rmtree(out, ignore_errors=True)
