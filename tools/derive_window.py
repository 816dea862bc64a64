"""Derive the driver-window ordering mechanically from the correctness
ledger (r06 verdict task #6).

The external driver records hard-signal correctness rows for only the
FIRST 50 registry entries (dict insertion order), so each round the
window must rotate to keep every id's latest row green and at most ~2
rounds old. Through round 6 that rotation was hand-listed in
``operators/__init__.py`` and verified after the fact; this tool makes
the freshness invariant mechanical:

1. ids whose code **materially changed this round**
   (``operators.ROUND_CHANGED_IDS``) are promoted to the head — a
   changed op earns a fresh hard-signal row on principle, even when its
   oracle is unchanged;
2. the remaining slots fill **stalest-first**: ids sorted by the round
   of their latest CORRECTNESS_r*.json row, ties broken by canonical
   registry position (module iteration order, pre-rotation) so the
   output is deterministic.

``operators/__init__.py`` keeps ``DRIVER_WINDOW_FIRST`` as a pasted
literal (the registry must not depend on ledger files at import time —
the driver imports the package in its own environment);
``tests/test_registry_order.py`` recomputes the window with this module
and asserts the literal matches, so a stale hand-paste fails the suite.

Usage:  python tools/derive_window.py            # print the tuple
        python tools/derive_window.py --check    # exit 1 if literal drifted
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
WINDOW_SIZE = 50


def registry_base_order() -> list[str]:
    """Canonical registry order: module iteration order, WITHOUT the
    DRIVER_WINDOW_FIRST rotation applied (all_queries() applies it)."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import MODULES

    out: list[str] = []
    for m in MODULES:
        out.extend(m.QUERIES.keys())
    return out


def latest_rows(
    repo_root: Path = REPO_ROOT, max_round: int | None = None
) -> dict[str, int]:
    """id -> round number of its most recent GREEN driver correctness row.

    Two deliberate filters (r07 verdict task #2 + advice):

    * ``max_round`` anchors the derivation to the ledger state the
      pasted literal was frozen against (``operators.WINDOW_LEDGER_MAX``).
      The driver drops the CURRENT round's CORRECTNESS_r{N}.json into the
      tree mid-round; without the anchor that file would rotate the
      derived window to the NEXT cohort and redden the drift check for
      anyone cloning between the ledger landing and the next freeze.
    * only rows with ``hash_match == true`` count toward freshness: a red
      row or an oracle-less row (``err: "no_oracle"``, hash_match null)
      must keep its id INSIDE the window for re-proving, exactly like a
      never-proven id, not rotate it out.
    """
    latest: dict[str, int] = {}
    ledgers = sorted(
        repo_root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    for path in ledgers:
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        if max_round is not None and rnd > max_round:
            continue
        for qid, row in json.loads(path.read_text()).items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                latest[qid] = rnd
    return latest


def derive_window(
    changed_ids: tuple[str, ...],
    repo_root: Path = REPO_ROOT,
    size: int = WINDOW_SIZE,
    max_round: int | None = None,
) -> list[str]:
    base = registry_base_order()
    idx = {k: i for i, k in enumerate(base)}
    unknown = [c for c in changed_ids if c not in idx]
    if unknown:
        raise ValueError(f"ROUND_CHANGED_IDS not in registry: {unknown}")
    latest = latest_rows(repo_root, max_round=max_round)
    # Promoted head: materially-changed ids, canonical order.
    head = sorted(changed_ids, key=idx.__getitem__)
    # Tail: stalest-first (never-proven ids sort as round 0 — they must
    # be inside the window), tie-broken by canonical position.
    rest = [k for k in base if k not in set(head)]
    rest.sort(key=lambda k: (latest.get(k, 0), idx[k]))
    return (head + rest)[:size]


def main(argv: list[str]) -> int:
    sys.path.insert(0, str(REPO_ROOT))
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        DRIVER_WINDOW_FIRST,
        ROUND_CHANGED_IDS,
        WINDOW_LEDGER_MAX,
    )

    window = derive_window(ROUND_CHANGED_IDS, max_round=WINDOW_LEDGER_MAX)
    if "--check" in argv:
        if list(DRIVER_WINDOW_FIRST) != window:
            print("DRIVER_WINDOW_FIRST drifted from the derived window:")
            print("  derived :", window)
            print("  literal :", list(DRIVER_WINDOW_FIRST))
            return 1
        print(f"OK: literal window matches derivation ({len(window)} ids)")
        return 0
    print("DRIVER_WINDOW_FIRST = (")
    for qid in window:
        print(f'    "{qid}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
