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
import functools
import glob
import json
import os
import shutil
import urllib.parse
import zipfile
from dataclasses import dataclass

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


@functools.lru_cache(maxsize=4096)
def _fs_for(path: str):
    """(filesystem, fs-local path) for the streamed sink's fragment
    I/O. Scheme-qualified URIs (file://, hdfs://, s3://...) resolve
    through pyarrow.fs, so the executor-side stitch lists, reads, and
    writes fragments on the cluster's SHARED store — on a real cluster
    the fragment datasets and the stitched part files live on the same
    DFS the Spark writers targeted, not on any one machine's disk.
    Bare paths keep the local POSIX fast path (None filesystem).

    Memoized per path: the stitch looks fragment directories up once
    per fragment LINE (a grandchild dir per split-mode element), and
    the distinct-path population is bounded by the split levels'
    SMALL_PARENT_ROWS cardinality gate plus one part file per root —
    without the cache an hdfs://s3 target would re-instantiate a
    filesystem client thousands of times per root task."""
    if "://" not in path:
        return None, path
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def _iter_part_lines(dirpath: str):
    fs, p = _fs_for(dirpath)
    if fs is None:
        for f in sorted(glob.glob(os.path.join(p, "part-*"))):
            with open(f) as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        yield line
        return
    import io

    from pyarrow import fs as pafs

    files = sorted(
        i.path
        for i in fs.get_file_info(pafs.FileSelector(p))
        if i.type == pafs.FileType.File
        and i.path.rsplit("/", 1)[-1].startswith("part-")
    )
    for f in files:
        with fs.open_input_stream(f) as raw:
            for line in io.TextIOWrapper(raw):
                line = line.rstrip("\n")
                if line:
                    yield line


def _listdir(tmp: str, prefix: str) -> list[tuple[str, str]]:
    """(basename, openable path) of tmp's entries starting with prefix;
    URI inputs keep their scheme on the returned paths so downstream
    reads resolve through the same filesystem."""
    fs, p = _fs_for(tmp)
    if fs is None:
        return [
            (os.path.basename(d), d)
            for d in glob.glob(os.path.join(p, prefix + "*"))
        ]
    from pyarrow import fs as pafs

    scheme_prefix = tmp[: len(tmp) - len(p)] if tmp.endswith(p) else ""
    out = []
    for i in fs.get_file_info(pafs.FileSelector(p)):
        base = i.path.rsplit("/", 1)[-1]
        if base.startswith(prefix):
            out.append((base, scheme_prefix + i.path))
    return out


def _partition_dirs(tmp: str, key: str) -> dict[str, str]:
    """partition-value string -> directory, for a partitionBy(key) text
    write (Spark URL-escapes values in directory names)."""
    out = {}
    for base, d in _listdir(tmp, f"{key}="):
        out[urllib.parse.unquote(base.split("=", 1)[1])] = d
    return out


def _mkdirs(path: str) -> None:
    fs, p = _fs_for(path)
    if fs is None:
        os.makedirs(p, exist_ok=True)
    else:
        fs.create_dir(p, recursive=True)


def _rename(src: str, dst: str) -> None:
    """Atomic-on-POSIX rename (last-wins on collision); the pyarrow.fs
    leg uses move(), whose atomicity is the target store's (rename on
    HDFS/local, copy+delete on object stores — the standard Spark
    committer trade-off). src and dst are always siblings here, so they
    resolve through the same filesystem."""
    fs, ps = _fs_for(src)
    _fs2, pd_ = _fs_for(dst)
    if fs is None:
        os.replace(ps, pd_)
    else:
        fs.move(ps, pd_)


def _part_bytes(dirpath: str) -> int:
    """Total bytes across a directory's part-* files — the post-write
    emptiness check (an empty NDJSON write is all-zero-byte part files),
    replacing the pre-write isEmpty() whose take(1) re-executed the
    whole map side of a nested collection's plan."""
    fs, p = _fs_for(dirpath)
    if fs is None:
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(p, "part-*"))
        )
    from pyarrow import fs as pafs

    return sum(
        i.size or 0
        for i in fs.get_file_info(pafs.FileSelector(p))
        if i.type == pafs.FileType.File
        and i.path.rsplit("/", 1)[-1].startswith("part-")
    )


def _attempt_tag() -> str:
    """Unique-per-task-attempt suffix for in-progress part files: a
    speculative or zombie duplicate attempt writes its own temp file and
    the final rename is last-wins-atomic, so two attempts can never
    interleave bytes into one part (Spark's own writers use the same
    attempt-scoped-temp + commit shape)."""
    import uuid

    from pyspark import TaskContext

    tc = TaskContext.get()
    if tc is not None:
        return str(tc.taskAttemptId())
    return uuid.uuid4().hex[:12]


def _rm_rf(path: str) -> None:
    fs, p = _fs_for(path)
    if fs is None:
        shutil.rmtree(p, ignore_errors=True)
    else:
        try:
            fs.delete_dir(p)
        except (FileNotFoundError, OSError):
            pass


def _open_text_out(path: str):
    fs, p = _fs_for(path)
    if fs is None:
        return open(p, "w")
    import io

    return io.TextIOWrapper(fs.open_output_stream(p))


@dataclass
class _LevelSpec:
    """Executor-picklable description of one written streamed level: the
    array field name, its key -> fragment-directory map (metadata-scale
    by construction — every split level's cardinality is gated at
    SMALL_PARENT_ROWS), and the specs of its own split-out children
    (empty for a leaf level, whose lines are complete documents)."""

    name: str
    dirs: dict[str, str]
    children: list["_LevelSpec"]


def _write_doc(out, seg_bodies, keys, specs):
    """One JSON document: interleave the J+1 segment bodies with the J
    child arrays, every separator contingent on the parts actually
    present — matching the distributed writer's null-omission (a parent
    with no children omits the array field entirely, like the left
    join's null array). seg_bodies are '{...}' JSON strings; keys[j] is
    the canonical-encoded lookup key for specs[j]'s directory map (None
    or a sentinel miss => omitted array)."""
    out.write("{")
    any_ = False
    for j, seg in enumerate(seg_bodies):
        body = seg[1:-1]
        if body:
            if any_:
                out.write(",")
            out.write(body)
            any_ = True
        if j >= len(specs):
            continue
        spec = specs[j]
        d = spec.dirs.get(keys[j]) if keys[j] is not None else None
        first = True
        for line in _iter_part_lines(d) if d is not None else ():
            if first:
                if any_:
                    out.write(",")
                out.write(json.dumps(spec.name) + ":[")
                first = False
            else:
                out.write(",")
            if spec.children:
                # Split-mode element: child keys + segment halves. The
                # fixed-width split is safe for ANY key value: keys are
                # URL-encoded canonical form (tab-free by construction,
                # NULL coalesced to a sentinel upstream) and to_json
                # escapes control chars inside the segments.
                J = len(spec.children)
                fields = line.split("\t", 2 * J)
                _write_doc(out, fields[J:], fields[:J], spec.children)
            else:
                out.write(line)  # leaf: a complete document
        if not first:
            out.write("]")
            any_ = True
    out.write("}")


def _write_level(level, path: str, tmps: list[str]) -> _LevelSpec:
    """Write one streamed level's text dataset partitioned by its parent
    key: one partition per key value and a struct sort within it — the
    writer's required ordering (partition cols) is satisfied by our
    (key, struct...) prefix, so rows land in ONE file per key in
    array_sort element order. Keys are the canonical encoded form
    (nesting._stream_key) on BOTH the partition column and the lookups,
    so directory reads can never miss on a rendering mismatch."""
    tmps.append(path)
    if level.rows is not None:
        (
            _replanned(level.rows)
            .repartition(F.col("__pk"))
            .sortWithinPartitions("__pk", "__st")
            .select("__pk", F.to_json("__st").alias("value"))
            .write.mode("overwrite")
            .partitionBy("__pk")
            .text(path)
        )
        return _LevelSpec(level.name, _partition_dirs(path, "__pk"), [])
    n = len(level.children)
    key_cols = [f"__k{j}" for j in range(n)]
    seg_cols = [f"__seg{j}" for j in range(n + 1)]
    (
        _replanned(level.fragments)
        .repartition(F.col("__pk"))
        .sortWithinPartitions("__pk", *seg_cols)
        .select(
            "__pk",
            F.concat_ws(
                "\t", *key_cols, *[F.to_json(c) for c in seg_cols]
            ).alias("value"),
        )
        .write.mode("overwrite")
        .partitionBy("__pk")
        .text(path)
    )
    children = [
        _write_level(ch, f"{path}{j}_", tmps)
        for j, ch in enumerate(level.children)
    ]
    return _LevelSpec(level.name, _partition_dirs(path, "__pk"), children)


def _stitch_part(part_path: str, batch, specs) -> None:
    """Write one final part file: the NDJSON lines of a batch of roots,
    in batch order. Task-commit protocol: the bytes stream into an
    attempt-unique dot-temp sibling (invisible to every part-* glob and
    to Spark readers), then one rename publishes it — a duplicate task
    attempt races on the rename, not on the bytes. POSIX replace makes
    the race last-wins, but pyarrow's move() ERRORS on an existing
    destination on several stores — so a rename that collides with an
    already-published destination ADOPTS it (parts are only ever
    created by this publish, so presence implies a complete duplicate
    of the same batch) instead of failing a healthy task for losing a
    race to its own twin."""
    base = part_path.rsplit("/", 1)
    tmp = (
        f"{base[0]}/.{base[1]}.{_attempt_tag()}.tmp"
        if len(base) == 2
        else f".{part_path}.{_attempt_tag()}.tmp"
    )
    try:
        with _open_text_out(tmp) as out:
            for _idx, keys, segs in batch:
                _write_doc(out, segs, keys, specs)
                out.write("\n")
        try:
            _rename(tmp, part_path)
        except OSError:
            if _exists(part_path):
                _rm_one(tmp)
            else:
                raise
    except BaseException:
        # A failed attempt must not leave its dot-temp behind: the
        # stage-directory publish would carry the litter into the final
        # output (part-* globs skip it, but the zip parity mode's
        # os.walk does not). Hard-killed attempts bypass this; the
        # driver prunes remaining dot-temps before publishing.
        _rm_one(tmp)
        raise


def _exists(path: str) -> bool:
    fs, p = _fs_for(path)
    if fs is None:
        return os.path.exists(p)
    from pyarrow import fs as pafs

    try:
        return fs.get_file_info(p).type != pafs.FileType.NotFound
    except OSError:
        return False


def _rm_one(path: str) -> None:
    fs, p = _fs_for(path)
    try:
        if fs is None:
            os.remove(p)
        else:
            fs.delete_file(p)
    except (FileNotFoundError, OSError):
        pass


# Ceiling on final part files for one streamed collection: a
# thousand-root collection batches ~root_count/max_parts roots per task
# instead of emitting one part file per root (r10 verdict task #4).
# Tiny root counts (every TPC-H-shaped corpus here) stay one-root-per-
# part. Override per call via write_json_collections(stream_max_parts=).
STREAM_MAX_PARTS = 1024


def _write_streamed(pieces, target: str, max_parts: int = None) -> bool:
    """Assemble one HEAVY root collection in file space (r08 verdict #2):
    every over-threshold child level's documents are written by Spark as
    per-parent-key sorted JSON fragments (text files partitioned by the
    canonical FK key), and each root's NDJSON line is stitched by
    streaming concatenation — segment scalars + '"child":[' + fragment
    lines joined with commas + ']', recursively per level. No task (and
    no driver buffer) ever holds more than ONE leaf-level document,
    versus the one-row-per-root representation whose buffer is the whole
    root subtree. Content is byte-compatible with the distributed
    writer's NDJSON (same to_json machinery, same null-omission, array
    order = array_sort order via the __st struct sort), so the
    schema-guided read-back parses identically.

    The stitch itself runs ON EXECUTORS (r09 verdict #3): the collected
    roots frame is metadata-light (<= SMALL_PARENT_ROWS rows of keys +
    JSON segments), so it is re-distributed one root per task and each
    task streams exactly its own root's fragment bytes into its own
    part file — the driver never loops over fragment bytes, and a heavy
    root collection's final write parallelizes across the cluster
    instead of serializing through one driver file handle. File order
    (part-00000.., sorted by root key) keeps the output deterministic;
    past max_parts roots, consecutive sorted roots batch into one part
    file per task (multiple NDJSON lines — the same layout the
    distributed writer produces), so a thousand-root collection never
    emits a thousand part files (r10 verdict task #4).

    Publication is a directory swap (r10 ADVICE): parts stitch into a
    temp sibling and only a fully-stitched directory replaces the
    target, so a failure mid-stitch leaves the previous output intact
    instead of a part-file torso.

    Returns the written document count (one NDJSON line per root), 0
    for an empty collection (nothing written) — truthiness-compatible
    with the old boolean, and the count is a WRITE-TIME byproduct (the
    roots frame is collected here anyway), so callers that report doc
    counts no longer re-read the output."""
    import uuid

    spark = pieces.roots.sparkSession
    tmps: list[str] = []
    n = len(pieces.children)
    if max_parts is None:
        max_parts = STREAM_MAX_PARTS
    try:
        with _sort_based_collects(spark):
            # Roots FIRST: the frame is metadata-light, and an empty
            # collection must not pay the corpus-scale child writes
            # before its early return.
            roots = _replanned(pieces.roots).collect()
            if not roots:
                return 0
            specs = [
                _write_level(ch, f"{target}.__stream{i}_", tmps)
                for i, ch in enumerate(pieces.children)
            ]
        stage = f"{target}.__publish_{uuid.uuid4().hex[:8]}"
        tmps.append(stage)
        _mkdirs(stage)

        def root_key(r):
            return tuple(
                (r[f"__fk{i}"] is None, r[f"__fk{i}"] or "")
                for i in range(n)
            )

        payloads = [
            (
                idx,
                [r[f"__fk{i}"] for i in range(n)],
                [r[f"__seg{i}"] for i in range(n + 1)],
            )
            for idx, r in enumerate(sorted(roots, key=root_key))
        ]
        per_task = -(-len(payloads) // max(1, max_parts))
        batches = [
            (bi, payloads[off:off + per_task])
            for bi, off in enumerate(
                range(0, len(payloads), per_task)
            )
        ]

        def write_parts(part):
            for bi, batch in part:
                _stitch_part(f"{stage}/part-{bi:05d}.json", batch, specs)

        spark.sparkContext.parallelize(
            batches, max(1, len(batches))
        ).foreachPartition(write_parts)
        # A hard-killed attempt (executor loss, speculation loser shot
        # mid-write) bypasses _stitch_part's own temp cleanup; its
        # retried attempt succeeded, so any dot-temp still in the stage
        # dir is litter — prune before publishing (the zip parity
        # mode's os.walk would otherwise archive it).
        for base, p in _listdir(stage, "."):
            if base.endswith(".tmp"):
                _rm_one(p)
        # Overwrite semantics, like the distributed writer's
        # mode("overwrite"): a rerun with FEWER roots must not leave
        # stale part files in the target (every reader globs part-*, so
        # a leftover file is a phantom document). Delete-then-rename is
        # not one atomic op, but the stage directory is complete before
        # the old output disappears — no failure point leaves less than
        # one whole output behind.
        _rm_rf(target)
        _rename(stage, target)
        return len(payloads)
    finally:
        for t in tmps:
            _rm_rf(t)


def write_json_collections(
    collections: dict[str, DataFrame],
    out_dir: str,
    single_file: bool = False,
    zip_path: str | None = None,
    streamed: dict | None = None,
    stream_max_parts: int | None = None,
    counts: dict | None = None,
) -> list[str]:
    """Write each non-empty collection; returns the names written.

    counts: optional caller-owned dict, filled with {name: docs written}
    for every written collection AT WRITE TIME — streamed roots are
    counted from the driver-collected roots frame, distributed writes
    via an observe() metric on the write job itself, single_file from
    the collected list. The old pattern (re-reading the NDJSON output
    to count lines) cost a second full pass over every written byte at
    the 100x dataset; these counts are free byproducts of the write.

    streamed: optional {collection name: plans.nesting.StreamedRoot} —
    those collections are assembled per-root in file space instead of
    materializing root-document rows (see _write_streamed). Ignored in
    single_file parity mode (explicitly non-scale).

    stream_max_parts: part-file ceiling per streamed collection
    (default STREAM_MAX_PARTS).

    BREAKING (r11): a bare local out_dir (no filesystem scheme) on a
    non-local master is now rejected loudly — on a multi-node cluster
    executors scatter fragments across their own disks and child
    arrays silently vanish. Deployments whose nodes share one mount at
    an identical path (NFS etc.), where the bare path previously
    worked, keep working by naming the same location as a URI:
    out_dir='file:///shared/mount/out'. That spelling is an explicit
    statement that the path is shared storage, not executor-local."""
    streamed = streamed or {}
    if "://" in out_dir and (single_file or zip_path):
        # The parity modes are explicitly local (driver-side open() and
        # os.walk): a URI out_dir would yield a silently EMPTY zip or a
        # FileNotFoundError mid-write — reject it loudly instead.
        raise ValueError(
            "single_file / zip_path are local parity modes; out_dir "
            "must be a bare local path, not a URI"
        )
    if "://" not in out_dir and collections and not single_file:
        # A bare local path on a multi-node cluster silently corrupts
        # output (r10 ADVICE): executors write partition dirs to THEIR
        # local disks, the stitch's glob misses them, and child arrays
        # vanish without an error. Mirror the parity modes' loud
        # ValueError instead of relying on a docstring. single_file is
        # exempt: it collects to the driver and writes with a
        # driver-side open(), so no executor ever touches out_dir.
        master = (
            next(iter(collections.values())).sparkSession
            .sparkContext.master or ""
        )
        if not master.startswith("local"):
            raise ValueError(
                f"out_dir {out_dir!r} has no filesystem scheme but the "
                f"cluster master is {master!r}: executors would scatter "
                "fragments across their local disks. Use a shared-store "
                "URI (hdfs://, s3://, file:// on a shared mount)."
            )
    _mkdirs(out_dir)
    wrote: dict[str, bool] = {}
    plain: list[tuple[str, DataFrame, str]] = []
    for name, df in collections.items():
        df = _replanned(df)
        target = f"{out_dir.rstrip('/')}/{name}"
        if name in streamed and not single_file:
            n_docs = _write_streamed(
                streamed[name], target, stream_max_parts
            )
            wrote[name] = bool(n_docs)
            if counts is not None and n_docs:
                counts[name] = n_docs
            continue
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
            with _sort_based_collects(df.sparkSession):
                docs = [json.loads(r) for r in df.toJSON().collect()]
            if not docs:
                # `filter_nonempty_collection` (reference
                # server/WriteToFile.js:9-11): empty collections
                # dropped.
                continue
            wrote[name] = True
            if counts is not None:
                counts[name] = len(docs)
            with open(f"{target}.json", "w") as fh:
                json.dump(docs, fh, default=str)
        else:
            plain.append((name, df, target))
    if plain:
        from concurrent.futures import ThreadPoolExecutor

        def _write_one(item):
            name, df, target = item
            obs = None
            if counts is not None:
                from pyspark.sql import Observation

                # Row count as a metric of the write job itself (one
                # CollectMetrics pass-through node): the writer emits
                # exactly one NDJSON line per row, so this IS the doc
                # count — no read-back pass over the written bytes.
                obs = Observation()
                df = df.observe(obs, F.count(F.lit(1)).alias("n"))
            # Write FIRST, then decide emptiness from the written part
            # files' byte sizes (one fs metadata listing): the old
            # isEmpty() pre-check ran take(1), which re-executes the
            # whole map side of a nested collection's plan — at the
            # sf10 probe that was a second pass over every child
            # shuffle per collection. An empty write is all zero-byte
            # part files; drop it like the reference drops empty
            # collections (`filter_nonempty_collection`,
            # server/WriteToFile.js:9-11).
            df.write.mode("overwrite").json(target)
            if _part_bytes(target) == 0:
                _rm_rf(target)
                return name, False, 0
            return name, True, (int(obs.get["n"]) if obs is not None
                                else 0)

        # The write JOBS run concurrently from driver threads: each
        # flat collection's write parallelism is capped by its input
        # split count, so serial writes leave most cores idle at every
        # job's stage tail — concurrent submission makes the wall the
        # max job, not the sum (the scoped confs are session-wide, so
        # one context manager brackets all of them; plan-time conf
        # reads happen inside it).
        with _sort_based_collects(plain[0][1].sparkSession):
            with ThreadPoolExecutor(min(4, len(plain))) as pool:
                for name, ok, n_docs in pool.map(_write_one, plain):
                    wrote[name] = ok
                    if counts is not None and ok:
                        counts[name] = n_docs
    written = [n for n in collections if wrote.get(n)]
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
