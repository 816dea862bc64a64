"""JSON collection sink (operator `sink_json_collections`, SURVEY §2.1).

The reference writes one JSON file per non-empty collection (a single JSON
array per file) and zips the directory (reference server/WriteToFile.js:5-62;
empty-collection filter at :9-11). Spark-first equivalent: distributed
newline-delimited JSON per collection directory — the scalable layout — with
an optional single-array file mode for byte-level parity on small outputs.

Null fields are omitted on write (Spark's JSON writer default), matching the
reference's key-absent semantics for unmatched attributes / empty embeds.
"""

from __future__ import annotations

import contextlib
import json
import os
import zipfile

from pyspark.sql import DataFrame

# Hash aggregation holds EVERY group's collect_list buffer of a partition
# in memory before emitting; for the top nesting levels a group is a
# document-sized object graph (a region document at the 10x dataset is
# ~42 MB of nested structs), so a partition with a handful of heavy
# groups peaks at sum-of-groups x object overhead — the allocation
# profile that OOMed the 10x sweep's shared 1 GB local-mode heap. Sort
# aggregation streams ONE group at a time over a spillable sort, so the
# per-task peak drops to the largest single document (the inherent floor
# for materializing a document as a row). Scoped to this sink's actions:
# Spark plans aggregates at action time, so flipping the conf here
# covers the lazily-built migrate() frames without touching the session
# for other operators.
_OBJ_HASH_CONF = "spark.sql.execution.useObjectHashAggregateExec"
# Sort-merge join SORTS both sides, and sorting copies every row into
# the sorter's pages — for the upper nesting joins the streamed side is
# document-sized rows, so the copies are multi-MB humongous allocations
# (the UnsafeRow.copy OOM in the 10x sweep). A shuffled-hash join builds
# its hash table on the metadata-scale PARENT side and streams the
# document rows through untouched.
_PREFER_SMJ_CONF = "spark.sql.join.preferSortMergeJoin"

_SINK_CONFS = {_OBJ_HASH_CONF: "false", _PREFER_SMJ_CONF: "false"}


@contextlib.contextmanager
def _sort_based_collects(spark):
    prev = {k: spark.conf.get(k, None) for k in _SINK_CONFS}
    for k, v in _SINK_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _replanned(df: DataFrame) -> DataFrame:
    """A fresh DataFrame over the same logical plan. Spark memoizes each
    DataFrame's QueryExecution at first use, so a collection frame the
    caller already acted on (a count, an explain) would keep its
    hash-aggregate physical plan even under the sink's scoped confs —
    silently reopening the heap floor the confs exist to close. A no-op
    projection forces physical re-planning at the sink's action."""
    return df.select("*")


def write_json_collections(
    collections: dict[str, DataFrame],
    out_dir: str,
    single_file: bool = False,
    zip_path: str | None = None,
) -> list[str]:
    """Write each non-empty collection; returns the names written."""
    written: list[str] = []
    os.makedirs(out_dir, exist_ok=True)
    for name, df in collections.items():
        df = _replanned(df)
        target = os.path.join(out_dir, name)
        with _sort_based_collects(df.sparkSession):
            if single_file:
                # Parity mode: one JSON array per collection file, like
                # the reference's JSON.stringify of the whole collection.
                # One action per collection; the empty check falls out of
                # the collect. NOT a scale path: this collects the entire
                # collection to the driver — byte-parity testing on small
                # outputs only. The default distributed mode is the one to
                # point at a real corpus. (It still runs under the
                # streaming-aggregation confs: the nesting plan executes
                # inside the collect, with the same allocation profile.)
                docs = [json.loads(r) for r in df.toJSON().collect()]
                if not docs:
                    # `filter_nonempty_collection` (reference
                    # server/WriteToFile.js:9-11): empty collections
                    # dropped.
                    continue
                written.append(name)
                with open(f"{target}.json", "w") as fh:
                    json.dump(docs, fh, default=str)
            else:
                if df.isEmpty():
                    continue
                written.append(name)
                df.write.mode("overwrite").json(target)
    if zip_path:
        zip_abs = os.path.abspath(zip_path)
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(out_dir):
                for f in files:
                    full = os.path.join(root, f)
                    # Never zip the archive into itself (zip_path may live
                    # inside out_dir, like the reference's results/ dir).
                    if os.path.abspath(full) == zip_abs:
                        continue
                    zf.write(full, os.path.relpath(full, out_dir))
    return written
