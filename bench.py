#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "n_runs": N, "spread": {name: [min, max], ...}}

Each query is forced end-to-end with the noop sink (a bare count() would
let Catalyst prune computed columns and under-report the work).

Variance hygiene: the whole suite runs $SPARK_GRAFT_BENCH_RUNS times
(default 5, suite-interleaved so a query's repeats don't ride its own
just-warmed caches back-to-back); `queries` carries per-query MEDIANS and
`spread` the min/max, so sub-second run-to-run noise is visible instead
of consuming round-over-round attention.

Core-count scaling caveat (r12 verdict item 10): at the default sf0.1
every headline query runs 0.4-7 s, where per-stage scheduling and JVM
fixed costs dominate — so an 8-core run times within ~±30% of a 32-core
run (several queries are FASTER at 8 cores, less scheduling overhead).
That is the SF being too small to exercise parallelism, not serial
code; the in-bench `scale` block (sf1.0, 10x data) is where the
parallel fraction is measurable (all ratios sublinear in data size).
Read low-vs-high-core comparisons at sf0.1 accordingly.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from relational_to_doc_oriented_nosql_migrator_spark.session import get_spark
    from relational_to_doc_oriented_nosql_migrator_spark.engine import migrate
    from relational_to_doc_oriented_nosql_migrator_spark import streaming
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        dedup,
        graph,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
        windows,
    )

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def make_suite(sf_dir: str) -> dict:
        def bench_migrate() -> None:
            collections = migrate(spark, sf_dir)
            for df in collections.values():
                force(df)

        return {
            "migrate_full": bench_migrate,
            "q1_pricing": lambda: force(
                relational.q_agg_pricing_summary(spark, sf_dir)
            ),
            "nest_one_to_many": lambda: force(
                relational.nest_one_to_many_df(spark, sf_dir)
            ),
            "m2m_denormalize": lambda: force(
                relational.q_join_denormalize_m2m(spark, sf_dir)
            ),
            "dedup_minhash_lsh": lambda: force(
                dedup.q_ext_dedup_minhash(spark, sf_dir)
            ),
            "similarity_topk": lambda: force(
                similarity.q_ext_similarity_topk(spark, sf_dir)
            ),
            "session_windows": lambda: force(
                windows.q_ext_session_agg(spark, sf_dir)
            ),
            "text_quality": lambda: force(
                text.q_ext_text_quality(spark, sf_dir)
            ),
            "decontaminate": lambda: force(
                pipeline.q_ext_decontaminate(spark, sf_dir)
            ),
            "curation_pipeline": lambda: force(
                pipeline.q_ext_curation_pipeline(spark, sf_dir)
            ),
            "similarity_ivf": lambda: force(
                similarity.q_ext_similarity_ivf(spark, sf_dir)
            ),
            "mm_frame_sample": lambda: force(
                multimodal.q_ext_mm_frame_sample(spark, sf_dir)
            ),
            "stream_tumbling": lambda: force(
                streaming.QUERIES["ext_stream_tumbling_agg"](spark, sf_dir)
            ),
            # round-4 additions: perf-track the newest operator families
            # alongside their correctness rows
            "events_retention": lambda: force(
                windows.q_ext_events_retention(spark, sf_dir)
            ),
            "text_bigram_logprob": lambda: force(
                text.q_ext_text_bigram_logprob(spark, sf_dir)
            ),
            # Amortized production shape: run 1 builds the parquet index
            # (cached per process), later runs measure search-only — the
            # MEDIAN over n_runs is therefore the search cost. This is
            # the HEADLINE IVF-PQ number; the train-every-call sibling is
            # tracked separately in aux (r04 verdict item 5) so a
            # regression in either training or search stays visible
            # without the training cost dominating the suite total.
            "similarity_ivfpq_indexed": lambda: force(
                similarity.q_ext_similarity_ivfpq_indexed(spark, sf_dir)
            ),
            # iterative family: 3 Pregel steps over the ~480k-edge
            # co-transaction graph at sf0.1
            "graph_pagerank": lambda: force(
                graph.q_ext_graph_pagerank(spark, sf_dir)
            ),
        }

    headline = make_suite(SF_DIR)

    # Off-headline queries: timed with the same interleaving and
    # statistics but excluded from the suite total. similarity_ivfpq is
    # the self-contained train-every-call IVF-PQ spec — its per-call
    # Lloyd training is not the production shape (ivfpq_indexed is), but
    # a training-cost regression should still show up here.
    def make_aux(sf_dir: str) -> dict:
        from relational_to_doc_oriented_nosql_migrator_spark.operators import similarity

        return {
            "similarity_ivfpq_train_full": lambda: force(
                similarity.q_ext_similarity_ivfpq(spark, sf_dir)
            ),
            # round-9 add: the scale-path kNN (vote over the IVF-PQ
            # index shortlist). Aux, not headline: its cost is the
            # already-tracked ivfpq_indexed search plus an index-output-
            # sized vote, and headline membership is frozen for
            # cross-round delta comparability.
            "knn_classify_indexed": lambda: force(
                similarity.q_ext_knn_classify_indexed(spark, sf_dir)
            ),
        }

    aux = make_aux(SF_DIR)

    # Warm the JVM/session and the Python worker pool so query timings
    # measure queries, not interpreter startup.
    spark.range(1000).count()

    def _noop_batches(batches):
        yield from batches

    (
        spark.range(10_000)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_noop_batches, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    # Default 5: the shared bench host shows up-to-3x run spreads, and a
    # 3-run median still let one quiet+two noisy runs read as a
    # regression (round-3 postmortem); 5 runs keeps the median stable.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    samples: dict[str, list[float]] = {
        name: [] for name in list(headline) + list(aux)
    }
    # One warmup pass per query, excluded from the headline stats (r06
    # verdict task #7): the first execution pays whole-stage-codegen
    # compilation, HotSpot JIT warm-up, and parquet footer/OS page-cache
    # cold starts — recorded into the medians, those dominated the
    # spreads (ivfpq_indexed [2.21, 8.14] around a 2.34 trimmed mean) and
    # blunted regression sensitivity. The pass IS timed and shipped as
    # the `cold_queries` column (r07 verdict task #5): the round-1
    # baseline was recorded cold, so the apples-to-apples baseline ratio
    # reads against this column, the round-over-round one against the
    # warmed medians. Disable with SPARK_GRAFT_BENCH_WARMUP=0 (timings
    # then measure cold starts and `cold_queries` is omitted).
    # Per-query job labels (guide §1.5) so Spark-UI/event-log stage
    # attribution maps back to bench rows; thread-local, reset after
    # each query, zero effect on the timed work or the JSON contract.
    def timed(name: str, fn) -> float:
        spark.sparkContext.setJobDescription(f"bench:{name}")
        t0 = time.time()
        try:
            fn()
        finally:
            spark.sparkContext.setJobDescription(None)
        return round(time.time() - t0, 3)

    # Cold-row telemetry for the indexed similarity ids (r12 verdict
    # item 9): their cold time is BIMODAL by design — build_ivfpq_index
    # either adopts a complete persistent index that survived under the
    # index root (search-only cold row) or pays the full train+build.
    # Stamp which one this run was so cross-round cold comparisons
    # self-explain instead of reading as a regression.
    index_was_present = similarity.ivfpq_index_present(SF_DIR)
    index_reused = {
        "similarity_ivfpq_indexed": index_was_present,
        "knn_classify_indexed": index_was_present,
    }

    cold: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
        for name, fn in {**headline, **aux}.items():
            cold[name] = timed(f"cold:{name}", fn)
            # Per-query, not per-pass: a query later in dict order must
            # not read frames an earlier query's warmup persisted, or
            # its recorded cold time partially measures a warm cache.
            spark.catalog.clearCache()
    for _ in range(n_runs):
        for name, fn in {**headline, **aux}.items():
            samples[name].append(timed(name, fn))
        # Drop persisted frames so repeat runs measure the query, not the
        # previous run's caches (and cached RDDs don't accumulate x n).
        spark.catalog.clearCache()

    def median_of(ts: list[float]) -> float:
        return round(statistics.median(ts), 3)

    def trimmed_of(ts: list[float]) -> float:
        # Spread-robust companion statistic (r04 verdict item 8: the
        # shared host shows up-to-4x spreads): drop the single worst run
        # and average the rest, so one noisy outlier can't drag the
        # round-over-round comparison. With n_runs=1 it's the run itself.
        kept = sorted(ts)[:-1] if len(ts) > 1 else ts
        return round(statistics.fmean(kept), 3)

    timings = {name: median_of(samples[name]) for name in headline}
    out = {
        "metric": "headline_suite_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "n_runs": n_runs,
        "trimmed": {
            name: trimmed_of(ts) for name, ts in samples.items()
        },
        "spread": {
            name: [min(ts), max(ts)] for name, ts in samples.items()
        },
        # Off-total timings (same discipline, excluded from `value`):
        # the train-every-call IVF-PQ spec vs the indexed headline — the
        # explicit train-vs-indexed split the r04 verdict asked for.
        "aux_queries": {name: median_of(samples[name]) for name in aux},
        # Whether the persistent IVF-PQ index existed BEFORE the cold
        # pass: true = the indexed ids' cold rows are search-only,
        # false = they include the full train+build (r12 verdict item 9).
        "index_reused": index_reused,
    }
    if cold:
        # First-execution times (codegen + JIT + page-cache cold): the
        # comparable column for the cold-recorded round-1 baseline.
        out["cold_queries"] = {name: cold[name] for name in headline}
        out["cold_total"] = round(sum(out["cold_queries"].values()), 3)
        out["cold_aux_queries"] = {name: cold[name] for name in aux}

    # Scale-curve datapoint: the five most expensive headliners once each
    # at a 10x dataset (generated by tools/gen_scale_data.py; skipped when
    # absent so the suite stays self-contained). `ratio_vs_base` is
    # t(scale)/t(base); on 10x data an ideal compute-bound plan reads
    # ~10 (or below, where fixed per-query Spark overhead amortizes) —
    # materially above 10 means the plan scales super-linearly.
    # The scale point is additive, never fatal: generation is atomic
    # (write to a temp dir, rename into place) so a crashed run can't
    # leave a half-written dir that poisons later runs, and the scale
    # queries themselves are wrapped so a scale failure can never cost
    # the headline JSON.
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale/sf1.0"
    )
    scale_enabled = os.environ.get("SPARK_GRAFT_SCALE", "1") != "0"
    if scale_enabled and not os.path.isdir(scale_dir):
        try:
            import importlib.util
            import shutil

            spec = importlib.util.spec_from_file_location(
                "gen_scale_data",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools", "gen_scale_data.py"),
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            tmp_dir = scale_dir.rstrip("/") + ".tmp"
            shutil.rmtree(tmp_dir, ignore_errors=True)
            # Factor follows the dir names (sf0.1 base -> sf1.0 = 10x,
            # sf10 = 100x) so an env-pointed 100x dir can't silently
            # receive 10x data under a 100x name.
            base_sf, target_sf = _sf_of(SF_DIR), _sf_of(scale_dir)
            factor = (round(target_sf / base_sf)
                      if base_sf > 0 and target_sf > 0 else 10)
            mod.generate(base_dir=SF_DIR, factor=factor, out_dir=tmp_dir,
                         spark=spark, verbose=False)
            os.rename(tmp_dir, scale_dir)
        except Exception as exc:
            print(f"scale data generation failed: {exc}", file=sys.stderr)
    if scale_enabled and os.path.isdir(scale_dir):
        try:
            scale_suite = make_suite(scale_dir)
            scale_names = ["migrate_full", "q1_pricing",
                           "dedup_minhash_lsh", "curation_pipeline",
                           "stream_tumbling"]
            spark.catalog.clearCache()
            # Untimed warm pass: a full scan of every scale table first,
            # so the timed single runs measure the plans, not first-touch
            # I/O + file listing on freshly written parquet (the base
            # suite is warm from n_runs repeats; without this the ratio
            # is biased upward).
            import glob as _glob
            for p in _glob.glob(os.path.join(scale_dir, "*.parquet")):
                force(spark.read.parquet(p))
            scale_timings: dict[str, float] = {}
            for name in scale_names:
                scale_timings[name] = timed(f"scale:{name}",
                                            scale_suite[name])
            spark.catalog.clearCache()
            out["scale"] = {
                "sf": _sf_of(scale_dir),
                "sf_dir": scale_dir,
                "queries": scale_timings,
                "ratio_vs_base": {
                    q: round(scale_timings[q] / timings[q], 2)
                    for q in scale_timings if timings.get(q)
                },
            }
        except Exception as exc:
            print(f"scale bench failed: {exc}", file=sys.stderr)

    # Self-reporting regression check against the checked-in round-1
    # baseline (same headline set, same sf): per-query delta in seconds,
    # negative = faster than r1. Folded into the same single JSON line.
    base_path = os.path.join(os.path.dirname(__file__),
                             "BENCH_BASELINE_r01.json")
    try:
        with open(base_path) as f:
            base = json.load(f)
        if base.get("sf") == out["sf"]:
            out["delta_vs_r01"] = {
                q: round(timings[q] - base["queries"][q], 3)
                for q in timings if q in base.get("queries", {})
            }
            # Sum over SHARED queries only, so adding new suite entries
            # doesn't read as a regression against the r01 baseline.
            out["delta_total_vs_r01"] = round(
                sum(out["delta_vs_r01"].values()), 3
            )
    except (OSError, ValueError):
        pass

    line = json.dumps(out)
    # Duplicate the result line to a file BEFORE printing (r12 verdict
    # item 4): the r11 driver run captured only a bounded tail of the
    # bench output and the (long) one-line JSON was truncated out of it,
    # silently nulling the entire round-over-round PERF table. The file
    # gives any consumer a truncation-proof copy; stdout keeps the exact
    # same single-line contract as every prior round.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_out.json"), "w") as f:
            f.write(line + "\n")
    except OSError as exc:
        print(f"bench_out.json write failed: {exc}", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    sys.exit(main())
