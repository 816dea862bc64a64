"""100x (sf10) scale probe for a named subset of registry ids.

Runs each id's builder against $PROBE_SF_DIR (default
/tmp/spark_graft_scale/sf10) with a cancelJobGroup watchdog (SIGALRM
breaks py4j; cancelJobGroup + clearing spark.jobGroup.id is the safe
shape — see the round-5 journal). Must be launched with
PYTHONPATH=/root/repo so local-mode Python workers can import the
package (Pandas-UDF ops cloudpickle module references; a driver-only
sys.path.insert is NOT enough — that was the probe2 failure mode).

Usage:
  PYTHONPATH=/root/repo python tools/probe_sf10.py [id ...]
With no ids, probes every registry id missing an OK/GUARDED line in
$PROBE_DONE (default /tmp/probe100/.done3).
"""
import concurrent.futures as cf
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class QTimeout(Exception):
    pass


# Auxiliary ledger id: the IVF-PQ TRAIN+BUILD pass (not a registry
# query — the nightly-job cost, recorded separately so the *_indexed
# rows reflect amortized search).
AUX_BUILD = "aux_ivfpq_index_build"


def main():
    from relational_to_doc_oriented_nosql_migrator_spark.session import get_spark

    # periodicGC=1min: ContextCleaner residue (broadcasts, shuffle state,
    # codegen refs) accumulates across the ~145 heavy ops this process
    # ages through, because an 8 GB driver heap may never run a full GC
    # naturally — the r06 aged-JVM sink OOM class. Scoped HERE, not in
    # the shared session factory: forced minutely full GCs measured +17%
    # on the per-query bench.
    spark = get_spark(
        app_name="probe_sf10",
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    sf = os.environ.get("PROBE_SF_DIR", "/tmp/spark_graft_scale/sf10")
    done_path = os.environ.get("PROBE_DONE", "/tmp/probe100/.done3")
    os.makedirs(os.path.dirname(done_path) or ".", exist_ok=True)
    # Per-id wall-time ledger (JSON lines): the raw material for the
    # round's PROBE_r{N}.json artifact, so 100x regressions get the same
    # round-over-round diffing the sf0.1 bench has (r05 verdict #5).
    times_path = os.environ.get("PROBE_TIMES", done_path + ".times")
    done = set()
    if os.path.exists(done_path):
        done = set(open(done_path).read().split())
    # Explicit ids are ALSO filtered against the done-ledger: the
    # rotation below re-execs with the same argv, and unfiltered
    # explicit ids would re-run forever without ever reaching the tail
    # (delete $PROBE_DONE to force a re-probe of finished ids).
    ids = [q for q in (sys.argv[1:] or list(qs)) if q not in done]
    timeout = int(os.environ.get("PROBE_TIMEOUT", "900"))
    # Self-rotation (the sweep's lesson, replayed at sf10 in round 6):
    # an 8 GB JVM that has aged through ~30 ids OOMs on the heaviest
    # ones (sink_json_collections' full migrate + nested-JSON write
    # died mid-probe, then passed at 99.7s LEADING a fresh process).
    # After this many completed ids the process re-execs itself and
    # resumes from the done-ledger, via the sweep's alarm-bounded stop
    # + child-JVM kill + scratch sweep (a bare spark.stop() can hang on
    # a wedged JVM, and a bare execv orphans it holding 8 GB and leaks
    # the process's /tmp scratch dirs). <= 0 disables.
    from tools.scale_sweep import _restart

    # _restart bounds spark.stop() with signal.alarm(10); the handler
    # must RAISE to actually break out of a wedged Py4J call (a no-op
    # handler just EINTRs and the blocking recv retries). _restart's
    # except clause absorbs it.
    signal.signal(
        signal.SIGALRM,
        lambda _s, _f: (_ for _ in ()).throw(TimeoutError("stop hung")),
    )
    restart_every = int(os.environ.get("PROBE_RESTART_EVERY", "25"))
    # ENFORCED fresh-JVM contract (r06 verdict watch item #1): these ids
    # OOMed an AGED probe JVM but pass leading a fresh one — the sf10
    # JSON sink died after 32 ids, then passed at 99.7s first-up, and
    # pagerank (whose localCheckpoint pins RDD blocks in the shared
    # local-mode heap) died 20 ids into a generation in the round-8
    # re-freeze, then passed its automatic fresh-JVM retry at 96s.
    # Rather than narrating "needs a fresh JVM", the probe rotates
    # BEFORE such an id whenever this process has already run anything
    # (session.py's periodicGC=1min attacks the residue class too; this
    # is the belt-and-braces isolation assert).
    fresh_jvm_ids = set(
        os.environ.get("PROBE_FRESH_JVM_IDS",
                       "sink_json_collections,ext_graph_pagerank")
        .split(",")
    )
    # A persistently-timing-out id must not be silently retried in every
    # re-exec generation (r06 ADVICE): after MAX_TIMEOUTS recorded
    # timeout lines it is treated as done (the ledger keeps the
    # evidence; delete $PROBE_TIMES to re-probe).
    max_timeouts = int(os.environ.get("PROBE_MAX_TIMEOUTS", "2"))
    # Hard failures (a borderline id OOM-killing even a pristine JVM —
    # observed once for the sf10 JSON sink in round 8) are ledgered and
    # capped the same way, so the auto-restart below cannot loop on an
    # id that dies every generation.
    attempts: dict[str, int] = {}
    if os.path.exists(times_path):
        for line in open(times_path):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("timeout") or rec.get("fail"):
                attempts[rec["id"]] = attempts.get(rec["id"], 0) + 1
    exhausted = {q for q, n in attempts.items() if n >= max_timeouts}
    if exhausted:
        print(f"SKIP failed/timed-out-{max_timeouts}x: {sorted(exhausted)}",
              flush=True)
        ids = [q for q in ids if q not in exhausted]
    # Amortized-index contract (r09 verdict task #5): the *_indexed ids
    # measure SEARCH economics; the one-time TRAIN+BUILD pass is its own
    # auxiliary ledger row, run once per probe against a PERSISTENT
    # index dir (survives the fresh-JVM re-exec rotation), so both
    # indexed ids — and every later generation — read the same artifact
    # instead of paying an in-run rebuild each. Inserted AFTER the
    # exhausted filter: if every *_indexed consumer has been dropped,
    # there is no one to read the index and the build must not run.
    indexed_ids = {"ext_similarity_ivfpq_indexed", "ext_knn_classify_indexed"}
    if any(q in indexed_ids for q in ids):
        os.environ.setdefault(
            "SPARK_GRAFT_INDEX_DIR",
            os.path.join(os.path.dirname(done_path) or ".", "ivfpq_index"),
        )
        if AUX_BUILD not in done:
            pos = min(i for i, q in enumerate(ids) if q in indexed_ids)
            ids.insert(pos, AUX_BUILD)
    # Probe-cost hygiene (r11 verdict task #7): the five brute/
    # train-per-call similarity baselines were ~740s of the 2,324s r11
    # probe (topk 175.5, ivf 143.9, ivfpq 142.7, knn 140.2, lsh
    # 137.2). They are by-design correctness baselines whose scale
    # siblings carry the production path, so the probe widens their
    # query stride 10x by default (4,000 -> 400 strided queries at
    # sf10) — the corpus side, the index build, and every per-query
    # plan shape are unchanged; only the bounded query set shrinks.
    # Each reduced row carries "query_stride" so the ledger shows the
    # coverage; PROBE_FULL_QUERYSET=1 restores the full set (run it
    # once per round when the wall budget allows).
    reduced_ids = set(
        os.environ.get(
            "PROBE_REDUCED_QUERYSET_IDS",
            "ext_similarity_topk,ext_similarity_ivf,ext_similarity_ivfpq,"
            "ext_knn_classify,ext_similarity_lsh",
        ).split(",")
    )
    stride_mult = (
        1 if os.environ.get("PROBE_FULL_QUERYSET") == "1"
        else int(os.environ.get("PROBE_QUERY_STRIDE_MULT", "10"))
    )
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        similarity as _sim,
    )

    base_stride = _sim.QUERY_STRIDE
    n_this_process = 0
    pool = cf.ThreadPoolExecutor(max_workers=1)
    for qid in ids:
        if qid not in qs and qid != AUX_BUILD:
            print(f"SKIP {qid} not-in-registry", flush=True)
            continue
        if restart_every > 0 and n_this_process >= restart_every:
            print(f"RESTART after {n_this_process} ids", flush=True)
            _restart(spark)
        if qid in fresh_jvm_ids and n_this_process > 0:
            print(f"RESTART fresh-JVM contract for {qid}", flush=True)
            _restart(spark)
        t0 = time.time()

        stride = (
            base_stride * stride_mult
            if qid in reduced_ids and stride_mult > 1
            else base_stride
        )

        def run(qid=qid):
            spark.sparkContext.setJobGroup(qid, qid, interruptOnCancel=True)
            try:
                if qid == AUX_BUILD:
                    from relational_to_doc_oriented_nosql_migrator_spark.operators.similarity import (  # noqa: E501
                        build_ivfpq_index,
                    )

                    build_ivfpq_index(spark, sf)
                    return 4  # index relations published
                return qs[qid](spark, sf).count()
            finally:
                spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

        # Stride is set/reset ONLY from this (main) thread: a wedged
        # worker abandoned past the timeout grace must not race its
        # finally-reset against the next id's plan build (the reduced
        # row would then silently run the full query set while
        # ledgering query_stride).
        _sim.QUERY_STRIDE = stride

        try:
            fut = pool.submit(run)
            try:
                n = fut.result(timeout=timeout)
            except cf.TimeoutError:
                # cancelJobGroup reaches batch jobs only; streaming
                # micro-batches run under the query's own runId group,
                # so stop active streams explicitly too.
                spark.sparkContext.cancelJobGroup(qid)
                for sq in spark.streams.active:
                    try:
                        sq.stop()
                    except Exception:
                        pass
                try:
                    fut.result(timeout=60)
                except Exception:
                    # The worker is wedged past the grace period —
                    # abandon the single-thread pool, else every later
                    # id queues behind the stuck thread and reports a
                    # false TIMEOUT.
                    pool = cf.ThreadPoolExecutor(max_workers=1)
                raise QTimeout()
            t = round(time.time() - t0, 1)
            n_this_process += 1
            print(f"OK {qid} rows={n} t={t}"
                  + (f" query_stride={stride}"
                     if stride != base_stride else ""),
                  flush=True)
            rec = {"id": qid, "t": t, "rows": n}
            if stride != base_stride:
                rec["query_stride"] = stride
            with open(times_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            with open(done_path, "a") as f:
                f.write(qid + "\n")
        except QTimeout:
            print(f"FAIL {qid} TIMEOUT {timeout}s", flush=True)
            # Ledger the timeout (r06 ADVICE): visible in the PROBE
            # artifact, and counted so re-exec generations stop
            # retrying after PROBE_MAX_TIMEOUTS attempts.
            with open(times_path, "a") as f:
                f.write(json.dumps(
                    {"id": qid, "timeout": True, "limit_s": timeout}
                ) + "\n")
            n_this_process += 1  # the id consumed JVM lifetime
        except ValueError as ex:
            if "refuses" in str(ex):
                print(f"GUARDED {qid}", flush=True)
                with open(times_path, "a") as f:
                    f.write(json.dumps({"id": qid, "guarded": True}) + "\n")
                with open(done_path, "a") as f:
                    f.write(qid + "\n")
                n_this_process += 1  # counts toward rotation (r06 ADVICE)
            else:
                print(f"FAIL {qid} ValueError {str(ex)[:300]}", flush=True)
                # Same cap discipline as the generic failure path: an
                # un-ledgered FAIL would be retried by every re-exec
                # generation forever.
                with open(times_path, "a") as f:
                    f.write(json.dumps(
                        {"id": qid, "fail": f"ValueError: {str(ex)[:160]}"}
                    ) + "\n")
                n_this_process += 1  # the id consumed JVM lifetime
        except Exception as ex:
            print(f"FAIL {qid} {type(ex).__name__} {str(ex)[:300]}",
                  flush=True)
            # Ledger the failure (counted toward the retry cap above, so
            # a persistently-dying id is skipped after MAX_TIMEOUTS
            # generations instead of wedging the probe forever).
            with open(times_path, "a") as f:
                f.write(json.dumps(
                    {"id": qid, "fail": f"{type(ex).__name__}:"
                                        f" {str(ex)[:160]}"}
                ) + "\n")
            # The failed attempt aged the JVM like any other id (often
            # more — it typically died mid-allocation); count it toward
            # the rotation budget so a run of failures can't stretch a
            # generation far past restart_every.
            n_this_process += 1
            try:
                spark.range(1).count()
            except Exception:
                # Self-heal: a task OOM can take the whole local-mode JVM
                # with it. Re-exec and resume from the done-ledger (the
                # failed id retries, bounded by the cap) rather than
                # abandoning the run for a human to restart.
                print("JVM DEAD — self-restarting to resume", flush=True)
                _restart(spark)
    print("PROBE COMPLETE", flush=True)
    # Hard-exit: a wedged (abandoned) worker thread is non-daemon and
    # would otherwise block interpreter shutdown forever. os._exit skips
    # atexit, so sweep the operator scratch dirs explicitly.
    from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
        cleanup_scratch,
    )

    cleanup_scratch()
    os._exit(0)


if __name__ == "__main__":
    main()
