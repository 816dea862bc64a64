"""The curation ops advertise layout/parallelism-independent determinism:
split assignment, sampling decisions, and packed-sequence ids must be
byte-identical regardless of shuffle width or input file layout. These
tests re-run the ops under a different shuffle.partitions setting and over
a re-chunked copy of the documents table and require identical output."""

import os

import pytest
from pyspark.sql import functions as F

from relational_to_doc_oriented_nosql_migrator_spark.operators import pipeline, text
from tests.conftest import SF001


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qfn",
    [
        text.q_ext_split_assign,
        pipeline.q_ext_sample_stratified,
        pipeline.q_ext_pack_sequences,
    ],
    ids=["split", "sample", "pack"],
)
def test_deterministic_across_shuffle_width(spark, qfn):
    baseline = _rows(qfn(spark, SF001))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert _rows(qfn(spark, SF001)) == baseline
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_pack_deterministic_across_file_layout(spark, tmp_path):
    """Re-chunk documents into many small parquet files; packing must not
    change (the md5 ordering, not file/partition order, defines layout)."""
    alt = str(tmp_path / "alt")
    os.makedirs(alt)
    docs = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    docs.repartition(7).write.parquet(os.path.join(alt, "documents.parquet"))
    baseline = _rows(pipeline.q_ext_pack_sequences(spark, SF001))
    assert _rows(pipeline.q_ext_pack_sequences(spark, alt)) == baseline
    # Sanity: offsets stay inside the context window.
    out = pipeline.q_ext_pack_sequences(spark, alt)
    assert out.filter(
        (F.col("seq_offset") < 0)
        | (F.col("seq_offset") >= pipeline.PACK_SEQ_LEN)
    ).count() == 0
