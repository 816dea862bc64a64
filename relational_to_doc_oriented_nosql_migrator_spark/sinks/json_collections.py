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

import json
import os
import zipfile

from pyspark.sql import DataFrame


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
        target = os.path.join(out_dir, name)
        if single_file:
            # Parity mode: one JSON array per collection file, like the
            # reference's JSON.stringify of the whole collection. One action
            # per collection; the empty check falls out of the collect.
            # NOT a scale path: this collects the entire collection to the
            # driver — byte-parity testing on small outputs only. The
            # default distributed mode is the one to point at a real corpus.
            docs = [json.loads(r) for r in df.toJSON().collect()]
            if not docs:
                # `filter_nonempty_collection` (reference
                # server/WriteToFile.js:9-11): empty collections dropped.
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
