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
import glob
import json
import os
import shutil
import urllib.parse
import zipfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def _iter_part_lines(dirpath: str):
    for f in sorted(glob.glob(os.path.join(dirpath, "part-*"))):
        with open(f) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    yield line


def _partition_dirs(tmp: str, key: str) -> dict[str, str]:
    """partition-value string -> directory, for a partitionBy(key) text
    write (Spark URL-escapes values in directory names)."""
    out = {}
    for d in glob.glob(os.path.join(tmp, f"{key}=*")):
        val = urllib.parse.unquote(os.path.basename(d).split("=", 1)[1])
        out[val] = d
    return out


def _write_obj(out, left_body, array_name, elems, write_elem, right_body):
    """One JSON object: '{' left_body ',"name":[' elements ']' ','
    right_body '}' with every separator contingent on the parts actually
    present — matching the distributed writer's null-omission (a root
    with no children omits the array field entirely, like the left
    join's null array). write_elem renders one element into `out`
    (a pre-rendered line at the leaf level, a recursive _write_obj for
    fragment levels)."""
    any_ = False
    out.write("{")
    if left_body:
        out.write(left_body)
        any_ = True
    first = True
    for el in elems:
        if first:
            if any_:
                out.write(",")
            out.write(json.dumps(array_name) + ":[")
            first = False
        else:
            out.write(",")
        write_elem(el)
    if not first:
        out.write("]")
        any_ = True
    if right_body:
        if any_:
            out.write(",")
        out.write(right_body)
    out.write("}")


def _write_streamed(pieces, target: str) -> bool:
    """Assemble one HEAVY root collection in file space (r08 verdict #2):
    the heavy child's documents are written by Spark as per-root sorted
    JSON fragments (text files partitioned by the root FK), and each
    root's NDJSON line is stitched by streaming concatenation — root
    scalars + '"child":[' + fragment lines joined with commas + ']'. No
    task (and no driver buffer) ever holds more than ONE level-2
    document, versus the one-row-per-root representation whose buffer is
    the whole root subtree. Content is byte-compatible with the
    distributed writer's NDJSON (same to_json machinery, same
    null-omission, array order = array_sort order via the __st struct
    sort), so the schema-guided read-back parses identically.

    Returns False for an empty collection (nothing written)."""
    spark = pieces.roots.sparkSession
    two_level = pieces.child_rows is None
    tmp = target + ".__children__"
    tmp2 = target + ".__grandchildren__"
    with _sort_based_collects(spark):
        # Roots FIRST: the frame is metadata-light (<= SMALL_PARENT_ROWS
        # rows of key + JSON halves), and an empty collection must not
        # pay the corpus-scale child writes before its early return.
        roots = _replanned(pieces.roots).collect()
        if not roots:
            return False
        # One partition per key value and a struct sort within it: the
        # writer's required ordering (partition cols) is satisfied by
        # our (key, struct...) prefix, so rows land in ONE file per key
        # in array_sort element order. Keys are the canonical encoded
        # form (nesting._stream_key) on BOTH the partition column and
        # the collected roots, so directory lookups can never miss on a
        # rendering mismatch.
        if two_level:
            (
                _replanned(pieces.child_fragments)
                .repartition(F.col("__fk"))
                .sortWithinPartitions("__fk", "__stl", "__str")
                .select(
                    "__fk",
                    F.concat_ws(
                        "\t", "__k",
                        F.to_json("__stl"), F.to_json("__str"),
                    ).alias("value"),
                )
                .write.mode("overwrite")
                .partitionBy("__fk")
                .text(tmp)
            )
            (
                _replanned(pieces.grandchild_rows)
                .repartition(F.col("__k"))
                .sortWithinPartitions("__k", "__st")
                .select("__k", F.to_json("__st").alias("value"))
                .write.mode("overwrite")
                .partitionBy("__k")
                .text(tmp2)
            )
        else:
            (
                _replanned(pieces.child_rows)
                .repartition(F.col("__fk"))
                .sortWithinPartitions("__fk", "__st")
                .select("__fk", F.to_json("__st").alias("value"))
                .write.mode("overwrite")
                .partitionBy("__fk")
                .text(tmp)
            )
    try:
        child_dirs = _partition_dirs(tmp, "__fk")
        gchild_dirs = _partition_dirs(tmp2, "__k") if two_level else {}
        os.makedirs(target, exist_ok=True)
        with open(os.path.join(target, "part-00000.json"), "w") as out:

            def write_fragment(line: str) -> None:
                # two-level element: child scalars + spliced grandchild
                # array. The 3-field split is safe for ANY key value:
                # __k is the URL-encoded canonical key (tab-free by
                # construction, NULL coalesced to a sentinel upstream)
                # and to_json escapes control chars inside l2/r2.
                k, l2, r2 = line.split("\t", 2)
                gdir = gchild_dirs.get(k)
                _write_obj(
                    out, l2[1:-1], pieces.grandchild_name,
                    _iter_part_lines(gdir) if gdir is not None else (),
                    out.write, r2[1:-1],
                )

            for r in sorted(
                roots,
                key=lambda r: (r["__fk"] is None, r["__fk"] or ""),
            ):
                cdir = (
                    child_dirs.get(r["__fk"])
                    if r["__fk"] is not None else None
                )
                _write_obj(
                    out, r["__left"][1:-1], pieces.child_name,
                    _iter_part_lines(cdir) if cdir is not None else (),
                    write_fragment if two_level else out.write,
                    r["__right"][1:-1],
                )
                out.write("\n")
        return True
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(tmp2, ignore_errors=True)


def write_json_collections(
    collections: dict[str, DataFrame],
    out_dir: str,
    single_file: bool = False,
    zip_path: str | None = None,
    streamed: dict | None = None,
) -> list[str]:
    """Write each non-empty collection; returns the names written.

    streamed: optional {collection name: plans.nesting.StreamedRoot} —
    those collections are assembled per-root in file space instead of
    materializing root-document rows (see _write_streamed). Ignored in
    single_file parity mode (explicitly non-scale)."""
    written: list[str] = []
    streamed = streamed or {}
    os.makedirs(out_dir, exist_ok=True)
    for name, df in collections.items():
        df = _replanned(df)
        target = os.path.join(out_dir, name)
        if name in streamed and not single_file:
            if _write_streamed(streamed[name], target):
                written.append(name)
            continue
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
