#!/usr/bin/env python
"""Interleaved same-JVM A/B timing harness (r08 verdict #8).

This host's wall clock varies 30-70% across days and JVM generations
(README ledger notes; identical ext_similarity_topk code measured
94-255 s across probe passes), so one-shot numbers cannot adjudicate a
plan change. The discipline that has worked — used ad hoc for the
round-8 topk norm-factoring REJECTION and the similarity-family drift
adjudication — is made reusable here:

  * BOTH variants build their DataFrames in ONE process and execute in
    strict alternation (A B A B ...), so host drift hits both equally;
  * rep 0 of each variant is reported but EXCLUDED from the medians
    (it pays JIT/codegen warmup and scan caching for its sibling too);
  * per-rep times are printed in full — record the spread in the round
    ledger notes, never just a point estimate.

Usage:
  # adjudicate a suspected drift: quiet solo reps of one registered id
  python tools/ab_compare.py --id ext_similarity_lsh [--sf-dir D] [--reps 5]

  # compare the registered query against a variant builder
  python tools/ab_compare.py --id ext_similarity_lsh \
      --variant mypkg.mymod:candidate_fn [--reps 5]

The variant is `module.path:callable` with the registered signature
(spark, sf_dir) -> DataFrame. Execution action is .count() — the same
action the scale sweep's ledger rows time. Output: one JSON line with
per-rep times, trimmed medians, and the B/A ratio.
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resolve_variant(spec: str):
    mod_name, _, fn_name = spec.partition(":")
    if not fn_name:
        raise SystemExit(f"--variant must be module.path:callable, got {spec}")
    return getattr(importlib.import_module(mod_name), fn_name)


def _median(xs: list[float]) -> float | None:
    if not xs:
        return None
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--id", required=True, help="registered query id (A)")
    ap.add_argument("--variant", default=None,
                    help="module.path:callable for side B (omit for solo)")
    ap.add_argument("--a-variant", default=None,
                    help="module.path:callable replacing side A's builder "
                         "(the --id then only labels the output) — for "
                         "A/Bs whose registered wrapper would let "
                         "Catalyst prune the work under .count()")
    ap.add_argument("--action", choices=("count", "collect"),
                    default="count",
                    help="execution action. count matches the sweep "
                         "ledger rows but lets Catalyst PRUNE work that "
                         "doesn't affect cardinality — a global-agg "
                         "checksum variant under count() eliminates its "
                         "ENTIRE child plan (ungrouped aggregates return "
                         "one row no matter the input). Use collect for "
                         "checksum variants.")
    ap.add_argument("--reps", type=int, default=5,
                    help="timed reps per side (rep 0 excluded from medians)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args(argv)

    # The tuned session (8 GB heap via SPARK_GRAFT_DRIVER_MEM, codegen
    # confs): adjudications compare PLANS, so both sides must run in the
    # environment the probe/sweep ledgers use — a vanilla 1 GB driver
    # OOMs the sf10-class ids before any timing happens.
    from relational_to_doc_oriented_nosql_migrator_spark.session import (
        get_spark,
    )

    spark = get_spark(
        app_name="ab_compare", master=f"local[{args.cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    if args.a_variant:
        a_fn = _resolve_variant(args.a_variant)
        builders = {"A": lambda: a_fn(spark, args.sf_dir)}
    else:
        builders = {"A": lambda: entry.queries()[args.id](spark, args.sf_dir)}
    if args.variant:
        fn = _resolve_variant(args.variant)
        builders["B"] = lambda: fn(spark, args.sf_dir)

    times: dict[str, list[float]] = {k: [] for k in builders}
    rows: dict[str, int] = {}
    for rep in range(args.reps):
        for side, build in builders.items():
            t0 = time.monotonic()
            if args.action == "collect":
                n = len(build().collect())
            else:
                n = build().count()
            dt = round(time.monotonic() - t0, 2)
            times[side].append(dt)
            prev = rows.setdefault(side, n)
            if prev != n:
                print(json.dumps({"error": "nondeterministic rows",
                                  "side": side, "rows": [prev, n]}))
                return 1
            print(f"# rep {rep} {side}: {dt}s ({n} rows)", file=sys.stderr)
    if "B" in rows and rows["A"] != rows["B"]:
        print(json.dumps({"error": "row-count mismatch — variant is not "
                          "value-equivalent; adjudicate values first",
                          "rows": rows}))
        return 1
    med = {k: _median(v[1:]) for k, v in times.items()}
    out = {
        "id": args.id,
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "rows": rows["A"],
        "times": times,            # rep 0 first — warmup, shown not used
        "median_trimmed": med,
        "ratio_b_over_a": (
            round(med["B"] / med["A"], 3) if args.variant and med["A"]
            else None
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
