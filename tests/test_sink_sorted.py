"""Contract test for the range-sorted parquet sink: beyond the oracle's
row-level round trip, the LAYOUT must deliver data skipping — every
output file's l_shipdate [min, max] footer range is disjoint from every
other file's (ranges may touch at a boundary value, never overlap past
it), so a date-predicate scan can prune non-matching files from footers
alone."""

import glob
import os

import pyarrow.parquet as pq

from relational_to_doc_oriented_nosql_migrator_spark.operators import pipeline as P
from tests.conftest import SF0001


def test_sorted_sink_file_ranges_disjoint(spark):
    df = P.q_sink_parquet_sorted(spark, SF0001)
    # The returned frame reads from the sink directory; recover it from
    # the plan's file index.
    files = sorted(
        f for f in df.inputFiles() if f.endswith(".parquet")
    )
    assert 1 < len(files) <= P.SORT_TARGET_FILES
    ranges = []
    for f in files:
        md = pq.read_metadata(f.replace("file:", ""))
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "l_shipdate" and col.statistics:
                    st = col.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        assert lo is not None, f"no l_shipdate stats in {f}"
        ranges.append((lo, hi))
    ranges.sort()
    for (_lo, prev_hi), (next_lo, _hi) in zip(ranges, ranges[1:]):
        assert prev_hi <= next_lo, (
            f"overlapping file ranges: {prev_hi} > {next_lo}"
        )
    # And the sink is lossless: same row count as the source relation.
    src = spark.read.parquet(os.path.join(SF0001, "lineitem.parquet"))
    assert df.count() == src.count()
