#!/usr/bin/env python
"""Execute EVERY registered query at the 10x scale dataset on a
deliberately tiny vanilla session (local[8], 1 GB driver) — the
environment that exposes plan defects correctness suites can't see:

  - the explode-class broadcast OOM (Spark costs a Generate's output at
    its PRE-explode size, so corpus-keyed aggregates read as
    broadcastable at any volume — caught ext_dedup_dup_rate, then
    containment / decontaminate / embedding_lsh, round 4);
  - the planner's footer reader failing on part-file parquet
    directories (single-file driver testdata never trips it);
  - runaway guards (the O(n^2) baselines must REFUSE, not grind).

Usage:
  python tools/scale_sweep.py [sf_dir]        # default the bench scale dir

Checkpointing: completed ids append to <sf_dir>/.sweep_done (delete the
file for a fresh sweep). One query OOMing the JVM kills the process —
rerun; finished ids are skipped, so the sweep resumes after the victim.
A handful of ids need special handling, annotated in SKIP/NOTES below.

Round-5 result (rerun end-to-end with the watchdog machinery below):
143 OK + 2 GUARDED refusals by design = all 145 ids on the 1 GB
driver, zero failures (sink_json_collections ~30 s — it previously
needed a 2 GB heap until profiling traced the memory to document-sized
aggregation buffers, fixed in plans/nesting.py +
sinks/json_collections.py). Two of that run's slow spots were then
fixed at the root late in round 5, re-verified on the same 1 GB
vanilla driver: fuzzy_join_names 545 s -> 10.3 s (same 26,925,000
verified pairs; name-level SymSpell instead of id-level), and
ext_stream_session_agg's dispatcher-thread OOM (which the sweep's
fresh-JVM retry had papered over) eliminated by the files sink —
7.2 s first try.
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _QueryTimeout(Exception):
    """A query exceeded SWEEP_QUERY_TIMEOUT — the JVM is likely wedged
    (an OOM inside the scheduler thread hangs rather than crashes)."""


# Auxiliary ledger id: the IVF-PQ TRAIN+BUILD pass (not a registry
# query — the nightly-job cost, recorded separately so the *_indexed
# rows reflect amortized search). Same id the sf10 probe uses.
AUX_BUILD = "aux_ivfpq_index_build"


def _kill_child_jvms() -> None:
    """SIGKILL any java child of THIS process (pure /proc, no Py4J — the
    whole point is that the gateway may be wedged). Without this, an
    os.execv would orphan the hung 1 GB JVM, which keeps running and
    starves every later restart."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            stat = open(f"/proc/{pid}/stat").read()
            comm = stat[stat.index("(") + 1:stat.rindex(")")]
            ppid = int(stat[stat.rindex(")") + 2:].split()[1])
            if ppid == me and "java" in comm:
                os.kill(int(pid), signal.SIGKILL)
        except (OSError, ValueError):
            pass


def _restart(spark) -> None:
    """Fresh-process resume: graceful stop if the JVM still answers,
    hard child kill either way, then re-exec (ledgers carry the state).
    os.execv skips atexit, so operator scratch dirs (grnk staging,
    round-trip sinks) are swept explicitly first — otherwise every
    rotation generation leaks its /tmp copies."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        cleanup_scratch,
    )

    try:
        signal.alarm(10)
        spark.stop()
    except Exception:  # noqa: BLE001 — already dead or wedged
        pass
    finally:
        signal.alarm(0)
    _kill_child_jvms()
    cleanup_scratch()
    os.execv(sys.executable, [sys.executable] + sys.argv)

SKIP: set[str] = set()

# Ids whose 10x working set sits near the 1 GB ceiling on its own: they
# pass when they LEAD a fresh JVM and OOM after even a handful of other
# queries' heap fragmentation. The sweep re-execs before each of these
# unless the process is pristine.
HEAVY_FRESH_JVM = {
    "ext_dedup_embedding_lsh",   # 88k-pair exact verify, ~190 s
    "ext_fuzzy_join_names",      # 26.9M-pair edit-distance verify, ~545 s
    "sink_json_collections",     # full migrate + nested-JSON write
    "ext_stream_session_agg",    # 950k interval-union session state; OOMed
                                 # a few stream queries into a shared JVM,
                                 # passed on its retry's fresh one
}

def main() -> int:
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1.0"
    done_path = os.path.join(sf, ".sweep_done")
    # Per-id wall-time ledger (JSON lines, appended on OK/GUARDED):
    # persisted so each round can diff per-id times round-over-round —
    # a silent 3x regression in a non-headline op can't hide behind a
    # green pass/fail (r05 verdict follow-up #4). Reset with .sweep_done.
    times_path = os.path.join(sf, ".sweep_times")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "1g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    # Per-query watchdog: a wedged JVM (scheduler-thread OOM) HANGS the
    # Py4J call instead of raising — SIGALRM turns that into a FAIL that
    # the retry/restart machinery can handle. The budget comfortably
    # clears the slowest known query (fuzzy_join_names ~530 s).
    signal.signal(
        signal.SIGALRM,
        lambda _sig, _frm: (_ for _ in ()).throw(_QueryTimeout()),
    )
    query_timeout = int(os.environ.get("SWEEP_QUERY_TIMEOUT", "900"))

    done = set()
    retries_path = done_path + ".retries"
    failed_path = done_path + ".failed"
    if os.path.exists(done_path):
        done = set(open(done_path).read().split())
    else:
        # Fresh sweep (checkpoint deleted): reset the side ledgers too.
        for p in (retries_path, failed_path, times_path):
            if os.path.exists(p):
                os.remove(p)
    retried = set()
    if os.path.exists(retries_path):
        retried = set(open(retries_path).read().split())
    failed = set()
    if os.path.exists(failed_path):
        failed = set(open(failed_path).read().split())
    qs = e.queries()
    # Self-healing JVM rotation: queries run through ONE 1 GB JVM
    # accumulate enough heap fragmentation/metaspace that the heaviest
    # queries (ext_dedup_embedding_lsh's 88k-pair verify,
    # fuzzy_join_names' 26.9M-pair verify) die mid-sweep even though
    # they pass in a fresh JVM — measured: embedding_lsh OOMs ~21 light
    # queries into a fresh process, so the rotation period must be well
    # below that. After this many completed ids the process re-execs
    # itself and resumes from the checkpoint — the same resume path a
    # hard OOM death takes, just taken proactively. <= 0 disables.
    restart_every = int(os.environ.get("SWEEP_RESTART_EVERY", "12"))
    n_this_process = 0
    ids = sorted(qs)
    # Amortized-index contract, sweep edition (r10 verdict task #2):
    # the *_indexed ids measure SEARCH economics; the one-time
    # TRAIN+BUILD runs first as its own auxiliary ledger row against
    # the DEFAULT persistent index root (fingerprint-keyed under the
    # system temp dir — survives the fresh-JVM re-exec rotation), so
    # both indexed ids, and every later generation, read the same
    # artifact instead of paying an in-run rebuild each.
    indexed_ids = {"ext_similarity_ivfpq_indexed",
                   "ext_knn_classify_indexed"}
    if any(q in indexed_ids and q not in done and q not in failed
           for q in ids):
        if AUX_BUILD not in done:
            pos = min(i for i, q in enumerate(ids) if q in indexed_ids)
            ids.insert(pos, AUX_BUILD)
    for qid in ids:
        if qid in SKIP or qid in done or qid in failed:
            continue
        # Restart BEFORE a known heap-hungry id unless the JVM is
        # pristine (measured: embedding_lsh OOMs even ~9 light queries
        # into a fresh 1 GB process, but passes when it leads one), and
        # periodically otherwise. restart_every <= 0 disables the
        # periodic rotation; the n_this_process > 0 condition guarantees
        # progress (never re-exec twice without completing an id).
        need_fresh = qid in HEAVY_FRESH_JVM and n_this_process > 0
        if need_fresh or (
            restart_every > 0 and n_this_process >= restart_every
        ):
            print(f"RESTART after {n_this_process} ids"
                  f" ({'for ' + qid if need_fresh else 'periodic'})",
                  flush=True)
            _restart(spark)
        t0 = time.time()
        ok = True
        wedged = False
        try:
            signal.alarm(query_timeout)
            try:
                if qid == AUX_BUILD:
                    from relational_to_doc_oriented_nosql_migrator_spark.operators.similarity import (  # noqa: E501
                        build_ivfpq_index,
                    )

                    build_ivfpq_index(spark, sf)
                    n = 4  # index relations published
                else:
                    n = qs[qid](spark, sf).count()
            finally:
                signal.alarm(0)
            t = round(time.time() - t0, 2)
            print(f"OK {qid} rows={n} t={t}", flush=True)
            with open(times_path, "a") as f:
                f.write(json.dumps({"id": qid, "t": t, "rows": n}) + "\n")
        except _QueryTimeout:
            ok = False
            wedged = True
            print(f"FAIL {qid} TIMEOUT after {query_timeout}s (wedged"
                  f" JVM)", flush=True)
        except ValueError as ex:
            if "refuses" in str(ex):
                print(f"GUARDED {qid} (expected at 10x)", flush=True)
                with open(times_path, "a") as f:
                    f.write(json.dumps({"id": qid, "guarded": True}) + "\n")
            else:
                ok = False
                print(f"FAIL {qid} ValueError {str(ex)[:150]}", flush=True)
        except Exception as ex:  # noqa: BLE001 — sweep must keep going
            ok = False
            print(f"FAIL {qid} {type(ex).__name__} {str(ex)[:150]}",
                  flush=True)
        # Checkpoint only OK/GUARDED outcomes: a soft FAIL must be
        # retried on rerun, not permanently skipped (a checkpointed FAIL
        # would let a resumed sweep finish "complete" without ever
        # re-testing the failed id).
        if ok:
            n_this_process += 1
            with open(done_path, "a") as f:
                f.write(qid + "\n")
            continue
        # A failed query may also have KILLED the JVM (executor OOM in
        # local mode) — every later call would then report
        # ConnectionRefused garbage, so probe the session.
        try:
            spark.conf.get("spark.app.id")
            # A wedged scheduler can still answer driver-side conf calls
            # — a timed-out query always forces the fresh-process path.
            alive = not wedged
        except Exception:  # noqa: BLE001
            alive = False
        if qid not in retried:
            # One bounded in-place retry on a fresh process: the heavy
            # ids sit at the 1 GB ceiling and pass-or-OOM by GC timing
            # even in a pristine JVM (.retries persists across execv, so
            # a genuinely-broken id can't loop).
            with open(retries_path, "a") as f:
                f.write(qid + "\n")
            print(f"RETRY {qid} once on a fresh JVM", flush=True)
        else:
            # Second failure: record permanently for this sweep so the
            # resumed process skips it and the sweep still completes.
            with open(failed_path, "a") as f:
                f.write(qid + "\n")
            print(f"FAILPERM {qid}", flush=True)
            if alive:
                continue
        _restart(spark)
    # A FAIL retried to OK is not a failure; the one source of truth is
    # the FAILPERM ledger (re-read: this process may have appended).
    n_fail = 0
    if os.path.exists(failed_path):
        n_fail = len(set(open(failed_path).read().split()))
    print(f"SWEEP COMPLETE failures={n_fail}", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
