"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-at-scale first:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing) so the
  same logical plans survive a 100x scale-up without hand-tuning.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  across engines (the DuckDB oracle reads the same naive parquet timestamps).
- Arrow enabled for any pandas-UDF path (vectorized Python boundary).
- Broadcast threshold raised to 64 MiB: every dimension table in the star
  schema (region/nation/customer/supplier/part) should broadcast rather than
  shuffle at any scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "relational-to-doc-migrator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # HotSpot never JIT-compiles methods over 8000 bytecode bytes
        # (DontCompileHugeMethods): a fused whole-stage method holding a
        # 64-dim unrolled dot product inside a join inner loop crosses
        # that line and silently runs in the bytecode INTERPRETER —
        # measured 205s -> 5.1s (40x) on a 51M-pair centroid-assignment
        # loop at the 100x dataset with the flag. Code cache is raised
        # to fit the bigger compiled bodies. Driver-side flag covers the
        # executors too in local mode; on a real cluster mirror it in
        # spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 << 20))
        # NOTE on spark.cleaner.periodicGC.interval: deliberately LEFT AT
        # the 30min default here. ContextCleaner frees broadcast/shuffle
        # residue only when the driver GC collects the weak refs, and a
        # long-lived driver running hundreds of heavy ops can OOM before
        # a natural full GC (the r06 sf10 JSON-sink incident) — but an
        # aggressive 1min interval measured +17% across the whole bench
        # suite (forced full GCs stall every query). Long-running
        # multi-op harnesses opt in via extra_conf (tools/probe_sf10.py
        # does); per-query sessions must not pay for it.
        # The testdata parquet carries TIMESTAMP(NANOS), which Spark has no
        # native type for; read as long and restore micros timestamps at the
        # source (sources/parquet.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
