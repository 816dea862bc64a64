"""Round-over-round per-id wall-time diff for the sweep/probe ledgers
(r06 verdict task #3: artifacts frozen at HEAD must ship with a diff
flagging regressions instead of leaving readers to eyeball two JSONs).

Usage:
  python tools/ledger_diff.py SWEEP_TIMES_r06.json SWEEP_TIMES_r07.json \
      [--threshold 1.5]

Accepts either a frozen artifact (one JSON dict, per-id seconds under
"times_sec" or at top level) or a raw append ledger (the sweep/probe
.sweep_times/.done3.times files: one JSON record per line, {"id", "t"};
records without a numeric "t" — guarded/timeout — are skipped, and a
later record for the same id wins, matching the harness retry order).

Prints a markdown table of every id whose new time exceeds threshold x
its old time (and, for context, any id that improved by the same
factor), plus totals. Exit code 0 always — the diff is information for
the README, not a gate (host noise at the 1-2s level is real; the
threshold keeps the table short)."""

from __future__ import annotations

import argparse
import json
import sys


def times_of(path: str) -> dict[str, float]:
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    # A one-record raw ledger parses fine as whole-file JSON but is a
    # RECORD ({"id", "t", ...}), not an artifact — route it (and any
    # unparseable multi-line file) through the JSON-lines reader.
    if isinstance(d, dict) and "id" not in d:
        t = d.get("times_sec", d)
        return {k: v for k, v in t.items() if isinstance(v, (int, float))}
    # raw JSON-lines ledger: {"id": ..., "t": ...} per record; a later
    # record for the same id wins (harness retry order). Skip unparseable
    # lines — the appending probe is OOM/kill-prone mid-write, so a
    # truncated trailing line is an expected input, not an error.
    out: dict[str, float] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        t = rec.get("t")
        if isinstance(rec.get("id"), str) and isinstance(t, (int, float)):
            out[rec["id"]] = float(t)
    if not out:
        # Zero parseable records means the argument is not a ledger at
        # all (typo'd path, wrong file): a silent empty dict would
        # produce a plausible-looking "shared ids: 0 ... no regressions"
        # green report from garbage input. The per-line skip above is
        # only for a truncated TRAILING line of a real ledger.
        raise SystemExit(
            f"ledger_diff: {path} contains no ledger records"
            " (not a frozen artifact, and no JSON-lines {id, t} rows)"
        )
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old_path")
    ap.add_argument("new_path")
    ap.add_argument("--threshold", type=float, default=1.5)
    ns = ap.parse_args(argv)
    old_path, new_path, thr = ns.old_path, ns.new_path, ns.threshold
    old, new = times_of(old_path), times_of(new_path)
    shared = sorted(set(old) & set(new))
    slower, faster = [], []
    for k in shared:
        if old[k] <= 0:
            continue
        r = new[k] / old[k]
        if r >= thr and new[k] - old[k] >= 1.0:
            slower.append((r, k))
        elif r <= 1 / thr and old[k] - new[k] >= 1.0:
            faster.append((r, k))
    print(f"## Ledger diff: {old_path} -> {new_path} (threshold {thr}x)\n")
    print(f"shared ids: {len(shared)}; total "
          f"{sum(old[k] for k in shared):.1f}s -> "
          f"{sum(new[k] for k in shared):.1f}s\n")
    if not slower:
        print(f"No id regressed past {thr}x (with >=1s absolute growth).")
    else:
        print("| id | old s | new s | ratio |\n|---|---|---|---|")
        for r, k in sorted(slower, reverse=True):
            print(f"| {k} | {old[k]:.1f} | {new[k]:.1f} | {r:.2f}x |")
    if faster:
        print(f"\nImproved >= {thr}x:")
        print("| id | old s | new s | ratio |\n|---|---|---|---|")
        for r, k in sorted(faster):
            print(f"| {k} | {old[k]:.1f} | {new[k]:.1f} | {r:.2f}x |")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nids only in {old_path}: {only_old}")
    if only_new:
        print(f"\nids only in {new_path}: {only_new}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
