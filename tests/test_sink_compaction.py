"""File-count contract for the small-files compaction sink: the
fragmented layout really is fragmented, the compacted layout really is
compact, and content survives unchanged."""

import glob
import os

from relational_to_doc_oriented_nosql_migrator_spark.operators import (
    pipeline as P,
)
from relational_to_doc_oriented_nosql_migrator_spark.operators.common import t

from tests.conftest import SF001


def test_compaction_file_count_and_content(spark, monkeypatch):
    captured = {}
    real_mkdtemp = __import__("tempfile").mkdtemp

    def spy_mkdtemp(*a, **kw):
        d = real_mkdtemp(*a, **kw)
        if kw.get("prefix", "").startswith("sg_compact_") or (
            a and str(a[0]).startswith("sg_compact_")
        ):
            captured["base"] = d
        return d

    monkeypatch.setattr("tempfile.mkdtemp", spy_mkdtemp)
    out = P.q_sink_parquet_compacted(spark, SF001)
    base = captured["base"]
    frag = glob.glob(os.path.join(base, "fragmented", "part-*"))
    comp = glob.glob(os.path.join(base, "compacted", "part-*"))
    assert len(frag) == 64
    assert 1 <= len(comp) <= P.COMPACT_TARGET_FILES
    # content unchanged by the rewrite
    src = t(spark, SF001, "documents")
    assert out.count() == src.count()
    assert out.exceptAll(src).count() == 0
    assert src.exceptAll(out).count() == 0
