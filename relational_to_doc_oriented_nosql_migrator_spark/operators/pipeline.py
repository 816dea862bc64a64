"""Corpus-curation operators for training-data pipelines (SURVEY §2.11 /
BASELINE north star): PII scrubbing, benchmark decontamination, repetition
quality signals, and domain-mix rebalancing over the `documents` table.

All built-in JVM expressions (regexp/array/higher-order/window) — no Python
UDFs — so every op stays inside whole-stage codegen. Regex patterns are
written in the common Java-regex/RE2 dialect subset so the DuckDB oracles
run the byte-identical pattern.

Scale notes (100 TB):
- PII scrub is a narrow per-row map: no shuffle, fully pushdown-friendly.
- Decontamination shuffles once on the shingle hash (the canonical
  inverted-index join); shingles are md5-hashed so the shuffle key is
  uniform — no skew. Distinct-per-doc before the join keeps the join input
  at most |doc| x |unique shingles|.
- Repetition signals are zero-shuffle: per-doc functions computed
  row-locally (max bigram multiplicity = longest run of the sorted per-doc
  bigram array), never exploding bigrams into a corpus-sized shuffle.
- Domain mix aggregates to |sources| rows FIRST, then runs the global-share
  window over that tiny frame — the single-partition window never sees
  row-scale data.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
    footer_rows,
    scratch_dir,
    t,
)
from relational_to_doc_oriented_nosql_migrator_spark.operators.text import (
    SQL_TOKENS,
    docs_tokenized,
    tokens_col,
)

# Shared Java-regex/RE2-compatible PII patterns (applied in this order).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d -]{7,}\d"

# Decontamination shingle width (word n-grams; 13 is the common LLM value,
# 8 keeps the synthetic short docs exercised end to end).
DECONTAM_N = 8


def q_ext_text_pii_scrub(spark, sf_dir):
    """PII redaction: emails -> <EMAIL>, IPv4s -> <IP>, phone-like digit
    runs -> <PHONE>, applied in that order. Returns per-doc match counts
    plus an md5 of the scrubbed text (hash, not body, to keep the result
    row narrow — the full scrubbed column is the same expression)."""
    docs = t(spark, sf_dir, "documents")
    n_emails = F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace("text", EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def _shingles(col: str):
    """Distinct md5-derived 48-bit int word n-grams (n = DECONTAM_N) of a
    token-array column (by name); docs shorter than n yield one whole-doc
    shingle. Int keys (not md5-hex strings) so the decontamination join
    shuffles 8-byte keys instead of 32-char strings — half the shuffle
    volume at corpus scale; the oracle derives the identical ints."""
    n = DECONTAM_N
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size({col}) - {n - 1}, 1)),"
            f" i -> CAST(conv(substring(md5(concat_ws(' ',"
            f" slice({col}, i, {n}))), 1, 12), 16, 10) AS BIGINT))"
        )
    )


def decontaminate_from(docs_tk):
    """Decontamination over a pre-tokenized (doc_id, ..., tk) frame."""
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT) % 100"
    )
    with_shingles = docs_tk.select(
        "doc_id",
        (bucket < 90).alias("is_train"),
        "tk",
    ).select(
        "doc_id",
        "is_train",
        F.explode(_shingles("tk")).alias("shingle"),
    )
    train = (
        with_shingles.filter("is_train")
        .select("shingle")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    heldout = with_shingles.filter(~F.col("is_train"))
    # One left join + one groupBy: count(in_train) counts only matched
    # shingles, so the contaminated flag falls out of the same aggregation
    # — no second scan of the held-out branch, no semi-join + re-join.
    # MERGE hint: the train-shingle index is 90% of the corpus's distinct
    # shingles — corpus-scale, not a vocabulary — but its plan cost stays
    # at pre-explode size (Generate stats don't multiply), so without the
    # hint Spark broadcasts it at any data volume (the dup_rate OOM
    # class). Shuffle-on-shingle is the plan that survives 100 TB.
    return (
        heldout.join(train.hint("merge"), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("in_train").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            (F.col("n_shared") > 0).alias("contaminated"),
        )
    )


def q_ext_decontaminate(spark, sf_dir):
    """Benchmark decontamination: for every held-out (val/test) document,
    count its shingles that also occur in ANY train-split document; a doc
    with n_shared > 0 is contaminated and would be dropped from the eval
    set. Split assignment reuses ext_split_assign's md5 bucketing, so the
    check is deterministic end to end."""
    return decontaminate_from(docs_tokenized(spark, sf_dir))


def repetition_filter_from(docs_tk):
    """Repetition signals over a pre-tokenized (doc_id, ..., tk) frame.

    Plan shape — one doc_id hash shuffle of the narrow (doc_id, tk)
    frame, then explode + TWO exchange-free hash aggregations. The
    doc_id repartition is a SUBSET of both aggregates' grouping keys
    ((doc_id, ..., w1, w2) and (doc_id, ...)), so each HashAggregate
    runs partial+final in place with no further shuffle, and the whole
    post-exchange pipeline is one WholeStageCodegen span.

    This replaced a row-local sorted-run fold (aggregate() over the
    per-doc sorted bigram array). That shape looked scale-right — zero
    shuffle, O(len log len) per doc — but Catalyst higher-order
    functions are INTERPRETED (lambda expressions are excluded from
    codegen), and the measured constant was ~5ms CPU per ~50-token doc:
    310s for 500k docs at sf10 where this codegen explode+hash-agg plan
    needs a few seconds. The bigram rows never fan out to a corpus-wide
    shuffle: they are consumed by the co-located aggregate inside the
    same stage that generates them. arrays_zip/slice build the pairs
    (codegen collection expressions, not lambdas), and a doc with < 2
    tokens emits no pair rows, so it is absent from the output exactly
    as before — no pre-filter needed (a filter on size(tk) would be
    pushed below the exchange and re-tokenize at scan parallelism)."""
    spark = docs_tk.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tok = (
        docs_tk.select("doc_id", "tk")
        .repartition(n, "doc_id")
        .select(
            "doc_id",
            F.size("tk").alias("n_tokens"),
            F.size(F.array_distinct("tk")).alias("n_distinct"),
            "tk",
        )
    )
    # The count key is the space-joined bigram STRING, not the (w1, w2)
    # pair: that is the historical key (and the property test's Python
    # model), and for tokens that themselves contain spaces the two
    # differ — ("b b", "b") and ("b", "b b") collide as "b b b". The
    # greatest(...) guards the empty token array (slice rejects a
    # negative length); such docs emit no pair rows and stay absent.
    pairs = tok.select(
        "doc_id", "n_tokens", "n_distinct",
        F.explode(F.arrays_zip(
            F.expr("slice(tk, 1, greatest(size(tk) - 1, 0))"),
            F.expr("slice(tk, 2, greatest(size(tk) - 1, 0))"),
        )).alias("p"),
    ).select(
        "doc_id", "n_tokens", "n_distinct",
        F.concat(F.col("p").getItem("0"), F.lit(" "),
                 F.col("p").getItem("1")).alias("bg"),
    )
    per_doc = (
        pairs.groupBy("doc_id", "n_tokens", "n_distinct", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id", "n_tokens", "n_distinct")
        .agg(F.max("cnt").alias("max_n"))
    )
    distinct_ratio = F.round(
        F.col("n_distinct").cast("double") / F.col("n_tokens"), 6
    )
    # total bigrams == n_tokens - 1 by construction (adjacent pairs).
    top_frac = F.round(
        F.col("max_n").cast("double") / (F.col("n_tokens") - 1), 6
    )
    return per_doc.select(
        "doc_id",
        distinct_ratio.alias("distinct_ratio"),
        top_frac.alias("top_bigram_frac"),
        ((distinct_ratio >= 0.2) & (top_frac <= 0.18)).alias("keep"),
    )


def q_ext_repetition_filter(spark, sf_dir):
    """Gopher-style repetition signals: distinct-token ratio and the
    fraction of bigram occurrences taken by the single most frequent
    bigram; high top-bigram fraction / low distinct ratio flags looping or
    boilerplate text. spread=True keeps tokenization at full parallelism
    (it runs below the builder's doc_id exchange, so it would otherwise
    be pinned to the input file layout)."""
    return repetition_filter_from(docs_tokenized(spark, sf_dir, spread=True))


def q_ext_domain_mix(spark, sf_dir):
    """Domain-mix rebalancing: per-source corpus share by token count and
    the capped sampling weight (no domain may exceed 30% of the mix) that a
    sampler would apply — the classic pretraining mixture step."""
    docs = t(spark, sf_dir, "documents")
    per_source = (
        docs.select("source", F.size(tokens_col(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("sum_tokens"),
        )
    )
    # Global-share window over the aggregated |sources|-row frame only.
    total = F.sum("sum_tokens").over(Window.partitionBy())
    share = F.round(F.col("sum_tokens").cast("double") / total, 6)
    weight = F.round(
        F.least(share, F.lit(0.3)) / share, 6
    )
    return per_source.select(
        "source",
        "n_docs",
        "sum_tokens",
        share.alias("token_share"),
        weight.alias("sample_weight"),
    )


# Temperature for mixture flattening: target share p_i^ALPHA / sum p^ALPHA.
# ALPHA < 1 up-weights small domains (the standard multilingual /
# multi-domain pretraining move); ALPHA = 1 is the natural mix.
TEMPERATURE_ALPHA = 0.7


def q_ext_domain_mix_temperature(spark, sf_dir):
    """Temperature-scaled domain mixture: per-source natural token share,
    the temperature-flattened target share p^a / sum(p^a), and the
    sampling boost (target/natural) a sampler applies per source.

    Scale shape: identical to ext_domain_mix — one corpus aggregation to
    a |sources|-row frame; all windows/powers run on that tiny frame.
    Powers and shares are rounded before reuse and the normalizer is a
    decimal sum, so both engines compute identical mixtures.
    """
    docs = t(spark, sf_dir, "documents")
    per_source = (
        docs.select("source", F.size(tokens_col(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("sum_tokens"),
        )
    )
    total = F.sum("sum_tokens").over(Window.partitionBy())
    share = F.round(F.col("sum_tokens").cast("double") / total, 6)
    powed = per_source.select(
        "source",
        "n_docs",
        "sum_tokens",
        share.alias("share"),
    ).withColumn(
        "p_alpha",
        F.round(F.pow(F.col("share"), F.lit(TEMPERATURE_ALPHA)), 6),
    )
    ztot = (
        F.sum(F.col("p_alpha").cast("decimal(18,6)"))
        .over(Window.partitionBy())
        .cast("double")
    )
    tgt = powed.select(
        "source",
        "n_docs",
        "sum_tokens",
        "share",
        F.round(F.col("p_alpha") / ztot, 6).alias("target_share"),
    )
    return tgt.select(
        "source",
        "n_docs",
        "sum_tokens",
        "share",
        "target_share",
        F.round(F.col("target_share") / F.col("share"), 6).alias("boost"),
    )


def sample_stratified_from(docs_tk):
    """Stratified sampling over a pre-tokenized (doc_id, source, tk)
    frame."""
    per_source = (
        docs_tk.select("source", F.size(F.col("tk")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("sum_tokens"))
    )
    total = F.sum("sum_tokens").over(Window.partitionBy())
    share = F.round(F.col("sum_tokens").cast("double") / total, 6)
    weights = per_source.select(
        "source",
        F.round(F.least(share, F.lit(0.3)) / share, 6).alias("w"),
    )
    samp_bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 13, 12), 16, 10)"
        " AS BIGINT) % 1000"
    )
    return (
        docs_tk.select("doc_id", "source", samp_bucket.alias("samp_bucket"))
        .join(F.broadcast(weights), "source")
        .select(
            "doc_id",
            "source",
            "samp_bucket",
            (
                F.col("samp_bucket")
                < F.floor(F.col("w") * 1000).cast("bigint")
            ).alias("keep"),
        )
    )


def q_ext_sample_stratified(spark, sf_dir):
    """Stratified downsampling that APPLIES the domain-mix weights: each
    doc keeps iff its md5 sampling bucket (decorrelated from the split
    bucket by using hex chars 13-24) falls under source_weight x 1000. The
    per-source weight frame is tiny and broadcast — the corpus-side scan
    is one narrow map + broadcast-hash join, no shuffle of the docs."""
    return sample_stratified_from(docs_tokenized(spark, sf_dir))


# Sequence packing: fixed training-context length, and the bucket count
# that bounds each packer's state. Packing is greedy WITHIN a bucket (docs
# orderd by md5 for determinism), buckets pack independently, and the
# assignment stays deterministic at any bucket count.
PACK_SEQ_LEN = 4096
# Bucket count grows with the corpus (r05 verdict watch item #1 — the
# last hand-set scale constant): each bucket's running-cumsum window
# sorts that bucket on ONE task, so buckets must multiply as documents
# do. ~250k (doc_id, n_tokens, ord) rows is a few tens of MB of window
# state per task; the floor of 64 keeps every recorded sf<=0.1 result
# byte-identical (500-60k docs stay far under one bucket's budget).
PACK_BUCKETS_FLOOR = 64
PACK_DOCS_PER_BUCKET = 250_000


def pack_buckets(n_docs: int) -> int:
    """Packer bucket count for a corpus of n_docs (documents footer row
    count — no Spark job), floored at the driver/bench-scale constant."""
    return max(PACK_BUCKETS_FLOOR, -(-n_docs // PACK_DOCS_PER_BUCKET))


def q_ext_pack_sequences(spark, sf_dir):
    """Deterministic context-window packing: docs are bucketed by id hash,
    md5-ordered within each bucket, and laid head-to-tail; a doc's sequence
    id and offset fall out of the running token cumsum. One shuffle
    (partitionBy bucket), embarrassingly parallel across buckets."""
    docs = t(spark, sf_dir, "documents")
    n_buckets = pack_buckets(footer_rows(sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16,"
            f" 10) AS BIGINT) % {n_buckets}"
        ).alias("pack_bucket"),
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    return base.select("doc_id", "pack_bucket", "n_tokens", start).select(
        "doc_id",
        "pack_bucket",
        "n_tokens",
        F.expr(f"start div {PACK_SEQ_LEN}").alias("seq_id"),
        (F.col("start") % PACK_SEQ_LEN).alias("seq_offset"),
    )


def q_sink_parquet_partitioned(spark, sf_dir):
    """Hive-partitioned parquet sink, verified round trip: write documents
    partitioned by their deterministic split assignment, read the layout
    back, return (doc_id, split). Downstream readers filtering one split
    prune to that directory (partition pruning — the layout that makes a
    100 TB corpus scannable per-split; tests assert the pruning)."""

    docs = t(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT) % 100"
    )
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    out = os.path.join(scratch_dir("sg_part_sink_"), "docs")
    docs.select("doc_id", split.alias("split")).write.partitionBy(
        "split"
    ).mode("overwrite").parquet(out)
    return spark.read.parquet(out).select("doc_id", "split")


COMPACT_TARGET_FILES = 4


def q_sink_parquet_compacted(spark, sf_dir):
    """Small-files compaction, verified round trip: fragment `documents`
    into 64 tiny parquet files (the pathology a streaming or per-batch
    writer accumulates), then compact to COMPACT_TARGET_FILES via
    coalesce and read the result back — the maintenance job that keeps a
    100 TB lake scannable (every file costs a listing call, a footer
    read, and a scheduler task; 10^6 small files can dominate query time
    before a byte of data is read).

    Scale shape: compaction reads once and writes once; coalesce (not
    repartition) merges partitions WITHOUT a shuffle — the rewrite moves
    every byte exactly twice (in, out), nothing through the driver.
    tests/test_sink_compaction.py asserts the file-count contract.
    """

    base = scratch_dir("sg_compact_")
    fragmented = os.path.join(base, "fragmented")
    compacted = os.path.join(base, "compacted")
    docs = t(spark, sf_dir, "documents")
    docs.repartition(64).write.mode("overwrite").parquet(fragmented)
    (
        spark.read.parquet(fragmented)
        .coalesce(COMPACT_TARGET_FILES)
        .write.mode("overwrite")
        .parquet(compacted)
    )
    return spark.read.schema(docs.schema).parquet(compacted)


SORT_TARGET_FILES = 8


def q_sink_parquet_sorted(spark, sf_dir):
    """Range-sorted parquet layout for data skipping, verified round
    trip: repartitionByRange + sortWithinPartitions on l_shipdate, so
    every output file carries a DISJOINT shipdate min/max range and a
    date-predicate scan prunes all but the matching files from their
    footer stats alone — the layout-maintenance job that turns a
    time-filtered 100 TB scan into a few-file read.

    Scale shape: one range-sampling pass (repartitionByRange samples
    partition bounds) + one shuffle into the target layout + a local
    per-partition sort that also tightens parquet page/row-group stats.
    tests/test_sink_sorted.py asserts the disjoint-ranges contract from
    the parquet footers.
    """

    base = scratch_dir("sg_sorted_")
    out = os.path.join(base, "sorted")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )
    (
        li.repartitionByRange(SORT_TARGET_FILES, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.schema(li.schema).parquet(out)


def q_ext_curation_pipeline(spark, sf_dir):
    """The end-to-end curation pipeline as ONE composed plan: a doc
    survives iff it passes the quality filter, the repetition filter,
    is its exact-dup group's representative, is not the greater side of
    any verified MinHash near-dup pair (one-pass keep-first policy; the
    fully-transitive variant is ext_dedup_components), is not a
    contaminated held-out doc, and survives stratified sampling.
    Surviving train docs then get their packed-sequence assignment.

    Every stage reuses the shared `*_from` stage builders over ONE
    persisted tokenized frame (tokenization is the dominant CPU cost at
    corpus scale — round 1 re-tokenized 4-5x), so this is the integration
    query proving the ops compose with a single corpus scan."""
    from pyspark.storagelevel import StorageLevel

    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        dedup as dedup_ops,
    )

    # spread=True: repartition the raw scan BEFORE tokenizing/persisting —
    # the cache materializes in its input's partition layout, and a
    # few-file corpus would otherwise tokenize on 1-2 cores and serve
    # every downstream stage from a 1-partition cache.
    #
    # The persisted frame carries tk plus the three scalar features the
    # raw text is needed for (char count, punct count, exact-dup key) and
    # DROPS the text column itself: every downstream stage is tk-driven,
    # and caching the raw corpus alongside its token arrays would double
    # the cache footprint at scale for no reader.
    docs_tk = (
        docs_tokenized(spark, sf_dir, spread=True)
        .withColumn("n_chars_seen", F.length("text"))
        .withColumn(
            "punct", F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
        )
        .withColumn(
            "ck",
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ),
        )
        .drop("text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    punct_ratio = F.round(
        F.col("punct").cast("double") / F.col("n_chars_seen"), 6
    )
    rept = repetition_filter_from(docs_tk).select(
        "doc_id", F.col("keep").alias("keep_repetition")
    )
    near_losers = (
        dedup_ops.minhash_pairs_from(spark, dedup_ops.shingles_from(docs_tk))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("near_loser", F.lit(True))
    )
    decon = decontaminate_from(docs_tk).select("doc_id", "contaminated")
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10)"
        " AS BIGINT) % 100"
    )
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    # Per-row keep flags ride the base projection instead of re-joining
    # corpus-sized frames back on doc_id (guide §2.4 — the r11 shape
    # paid a doc_id join each for quality, exact-dup, and sampling):
    #   * keep_quality is a pure row function of the persisted columns;
    #   * keep_exact's group winner comes from one min-over-ck window —
    #     the same single ck exchange the old groupBy paid, minus the
    #     winners re-join (at corpus scale that join was a second
    #     corpus-wide ck exchange: the winners frame outgrows any
    #     broadcast ceiling);
    #   * keep_sample needs only the |sources|-row weight frame, joined
    #     broadcast on source exactly as in ext_sample_stratified.
    # Flag values are expression-identical to the r11 stage builders.
    per_source = (
        docs_tk.select("source", F.size(F.col("tk")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("sum_tokens"))
    )
    total = F.sum("sum_tokens").over(Window.partitionBy())
    share = F.round(F.col("sum_tokens").cast("double") / total, 6)
    weights = per_source.select(
        "source",
        F.round(F.least(share, F.lit(0.3)) / share, 6).alias("w"),
    )
    samp_bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 13, 12), 16, 10)"
        " AS BIGINT) % 1000"
    )
    base = (
        docs_tk.select(
            "doc_id",
            "source",
            "ck",
            split.alias("split"),
            F.size(F.col("tk")).alias("n_tokens"),
            (
                (F.col("n_chars_seen") >= 100) & (punct_ratio <= F.lit(0.1))
            ).alias("keep_quality"),
            samp_bucket.alias("samp_bucket"),
        )
        .withColumn(
            "keep_exact",
            F.min("doc_id").over(Window.partitionBy("ck"))
            == F.col("doc_id"),
        )
        .join(F.broadcast(weights), "source")
        .select(
            "doc_id",
            "split",
            "n_tokens",
            "keep_quality",
            "keep_exact",
            (
                F.col("samp_bucket")
                < F.floor(F.col("w") * 1000).cast("bigint")
            ).alias("keep_sample"),
        )
    )
    keep = (
        F.col("keep_quality")
        & F.coalesce("keep_repetition", F.lit(True))
        & F.col("keep_exact")
        & ~F.coalesce("near_loser", F.lit(False))
        & ~F.coalesce("contaminated", F.lit(False))
        & F.col("keep_sample")
    )
    joined = (
        base.join(rept, "doc_id", "left")
        .join(near_losers, "doc_id", "left")
        .join(decon, "doc_id", "left")
        .select("doc_id", "split", "n_tokens", keep.alias("keep"))
    )
    # bucket count from the corpus footer count (an upper bound on the
    # surviving train docs — both engines derive it from the same number)
    n_buckets = pack_buckets(footer_rows(sf_dir, "documents"))
    train = joined.filter(F.col("keep") & (F.col("split") == "train")).select(
        "doc_id",
        "n_tokens",
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16,"
            f" 10) AS BIGINT) % {n_buckets}"
        ).alias("pack_bucket"),
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = train.select(
        "doc_id",
        "pack_bucket",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start"),
    ).select(
        "doc_id",
        "pack_bucket",
        F.expr(f"start div {PACK_SEQ_LEN}").alias("seq_id"),
    )
    return joined.join(packed, "doc_id", "left").select(
        "doc_id", "split", "keep", "pack_bucket", "seq_id"
    )


QUERIES = {
    "sink_parquet_partitioned": q_sink_parquet_partitioned,
    "sink_parquet_compacted": q_sink_parquet_compacted,
    "sink_parquet_sorted": q_sink_parquet_sorted,
    "ext_curation_pipeline": q_ext_curation_pipeline,
    "ext_text_pii_scrub": q_ext_text_pii_scrub,
    "ext_decontaminate": q_ext_decontaminate,
    "ext_repetition_filter": q_ext_repetition_filter,
    "ext_domain_mix": q_ext_domain_mix,
    "ext_domain_mix_temperature": q_ext_domain_mix_temperature,
    "ext_sample_stratified": q_ext_sample_stratified,
    "ext_pack_sequences": q_ext_pack_sequences,
}

_SQL_SHINGLES = (
    f"list_distinct([('0x' || substr(md5(array_to_string("
    f"tk[i:i+{DECONTAM_N - 1}], ' ')), 1, 12))::BIGINT"
    f" for i in generate_series(1, greatest(len(tk) - {DECONTAM_N - 1}, 1))])"
)

_SQL_BUCKET = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100"
)

ORACLES = {
    # Lossless fragment->compact->read round trip returns the base table.
    "sink_parquet_compacted": "SELECT * FROM documents",
    "sink_parquet_sorted":
        "SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity"
        " FROM lineitem",
    "sink_parquet_partitioned": """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                 % 100 < 90 THEN 'train'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                 % 100 < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    "ext_text_pii_scrub": f"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{IPV4_RE}')) AS n_ips,
         regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id, n_emails, n_ips,
       len(regexp_extract_all(t2, '{PHONE_RE}')) AS n_phones,
       md5(regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM s2
""",
    "ext_decontaminate": f"""
WITH toks AS (
  SELECT doc_id, {_SQL_BUCKET} < 90 AS is_train, {SQL_TOKENS} AS tk
  FROM documents
), sh AS (
  SELECT doc_id, is_train, unnest({_SQL_SHINGLES}) AS shingle FROM toks
), train AS (
  SELECT DISTINCT shingle FROM sh WHERE is_train
), heldout AS (
  SELECT doc_id, shingle FROM sh WHERE NOT is_train
)
SELECT h.doc_id,
       COUNT(*) AS n_shingles,
       COUNT(t.shingle) AS n_shared,
       COUNT(t.shingle) > 0 AS contaminated
FROM heldout h LEFT JOIN train t USING (shingle)
GROUP BY h.doc_id
""",
    "ext_repetition_filter": f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKENS} AS tk FROM documents
), base AS (
  SELECT doc_id, len(tk) AS n_tokens,
         len(list_distinct(tk)) AS n_distinct, tk
  FROM toks
), bg AS (
  SELECT doc_id, n_tokens, n_distinct,
         unnest([tk[i] || ' ' || tk[i + 1]
                 for i in generate_series(1, greatest(len(tk) - 1, 0))])
           AS bigram
  FROM base
), counts AS (
  SELECT doc_id, n_tokens, n_distinct, bigram, COUNT(*) AS n
  FROM bg GROUP BY ALL
), per_doc AS (
  SELECT doc_id, n_tokens, n_distinct, MAX(n) AS max_n,
         SUM(n) AS total_bigrams
  FROM counts GROUP BY doc_id, n_tokens, n_distinct
)
SELECT doc_id,
       round(n_distinct::DOUBLE / n_tokens, 6) AS distinct_ratio,
       round(max_n::DOUBLE / total_bigrams, 6) AS top_bigram_frac,
       round(n_distinct::DOUBLE / n_tokens, 6) >= 0.2 AND
         round(max_n::DOUBLE / total_bigrams, 6) <= 0.18 AS keep
FROM per_doc
""",
    "ext_domain_mix_temperature": f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source
),
s AS (
  SELECT source, n_docs, sum_tokens,
         round(sum_tokens::DOUBLE / SUM(sum_tokens) OVER (), 6) AS share
  FROM per
),
p AS (SELECT *, round(pow(share, {TEMPERATURE_ALPHA}), 6) AS p_alpha FROM s),
z AS (SELECT CAST(SUM(CAST(p_alpha AS DECIMAL(18,6))) AS DOUBLE) AS ztot
      FROM p),
t2 AS (
  SELECT source, n_docs, sum_tokens, share,
         round(p_alpha / ztot, 6) AS target_share
  FROM p, z
)
SELECT source, n_docs, sum_tokens, share, target_share,
       round(target_share / share, 6) AS boost
FROM t2
""",
    "ext_domain_mix": f"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, sum_tokens,
       round(sum_tokens::DOUBLE / SUM(sum_tokens) OVER (), 6)
         AS token_share,
       round(least(round(sum_tokens::DOUBLE / SUM(sum_tokens) OVER (), 6),
                   0.3)
             / round(sum_tokens::DOUBLE / SUM(sum_tokens) OVER (), 6), 6)
         AS sample_weight
FROM per_source
""",
    "ext_sample_stratified": f"""
WITH per_source AS (
  SELECT source, SUM(len({SQL_TOKENS})) AS sum_tokens
  FROM documents GROUP BY source
), weights AS (
  SELECT source,
         round(least(round(sum_tokens::DOUBLE / SUM(sum_tokens) OVER (), 6),
                     0.3)
               / round(sum_tokens::DOUBLE / SUM(sum_tokens) OVER (), 6), 6)
           AS w
  FROM per_source
)
SELECT doc_id, source,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 12))::BIGINT % 1000
         AS samp_bucket,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 12))::BIGINT % 1000
         < CAST(floor(w * 1000) AS BIGINT) AS keep
FROM documents JOIN weights USING (source)
""",
}


def oracle_pack_sequences(n_docs: int) -> str:
    """Render the packer oracle with the SAME adaptive bucket count the
    engine derives from the documents footer row count — at driver scale
    pack_buckets(500) == PACK_BUCKETS_FLOOR renders the previously
    shipped static text byte for byte; harnesses auditing other SFs
    re-render via the SCALED_ORACLES seam."""
    return f"""
WITH base AS (
  SELECT doc_id, len({SQL_TOKENS}) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS ord,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
           % {pack_buckets(n_docs)} AS pack_bucket
  FROM documents
), c AS (
  SELECT doc_id, pack_bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY ord
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM base
)
SELECT doc_id, pack_bucket, n_tokens,
       CAST(start // {PACK_SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(start % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset
FROM c
"""


# The registered (static) instance is the driver-scale rendering.
ORACLE_SCALE_N_DOCS = 500
ORACLES["ext_pack_sequences"] = oracle_pack_sequences(ORACLE_SCALE_N_DOCS)


def _curation_oracle(n_docs: int = ORACLE_SCALE_N_DOCS) -> str:
    """Compose the single-op oracles as subqueries — the composite is
    checked against the same SQL the stages are checked against."""
    from relational_to_doc_oriented_nosql_migrator_spark.operators import (
        dedup as dedup_ops,
        text as text_ops,
    )

    return f"""
WITH qual AS (
  SELECT doc_id, keep AS keep_quality
  FROM ({text_ops.ORACLES["ext_text_quality"]})
), rept AS (
  SELECT doc_id, keep AS keep_repetition
  FROM ({ORACLES["ext_repetition_filter"]})
), exact AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
  FROM documents
), winners AS (
  SELECT ck, MIN(doc_id) AS rep FROM exact GROUP BY ck
), keepex AS (
  SELECT doc_id, doc_id = rep AS keep_exact
  FROM exact JOIN winners USING (ck)
), nearl AS (
  SELECT DISTINCT doc_b AS doc_id, TRUE AS near_loser
  FROM ({dedup_ops.ORACLES["ext_dedup_minhash"]})
), decon AS (
  SELECT doc_id, contaminated FROM ({ORACLES["ext_decontaminate"]})
), samp AS (
  SELECT doc_id, keep AS keep_sample
  FROM ({ORACLES["ext_sample_stratified"]})
), base AS (
  SELECT doc_id,
         CASE WHEN {_SQL_BUCKET} < 90 THEN 'train'
              WHEN {_SQL_BUCKET} < 95 THEN 'val'
              ELSE 'test' END AS split,
         len({SQL_TOKENS}) AS n_tokens
  FROM documents
), j AS (
  SELECT doc_id, b.split, b.n_tokens,
         q.keep_quality AND coalesce(r.keep_repetition, TRUE)
           AND k.keep_exact AND NOT coalesce(n.near_loser, FALSE)
           AND NOT coalesce(d.contaminated, FALSE)
           AND s.keep_sample AS keep
  FROM base b
  JOIN qual q USING (doc_id)
  LEFT JOIN rept r USING (doc_id)
  JOIN keepex k USING (doc_id)
  LEFT JOIN nearl n USING (doc_id)
  LEFT JOIN decon d USING (doc_id)
  JOIN samp s USING (doc_id)
), train AS (
  SELECT doc_id, n_tokens, md5(CAST(doc_id AS VARCHAR)) AS ord,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
           % {pack_buckets(n_docs)} AS pack_bucket
  FROM j WHERE keep AND split = 'train'
), packed AS (
  SELECT doc_id, pack_bucket,
         (SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY ord
                              ROWS UNBOUNDED PRECEDING) - n_tokens)
           // {PACK_SEQ_LEN} AS seq_id
  FROM train
)
SELECT doc_id, j.split, j.keep, p.pack_bucket, p.seq_id
FROM j LEFT JOIN packed p USING (doc_id)
"""


ORACLES["ext_curation_pipeline"] = _curation_oracle()

# Scale-adaptive oracle renderers (sf_dir -> SQL): harnesses pointed at
# a non-driver SF substitute these so both engines derive the adaptive
# constants from the same footer row counts.
SCALED_ORACLES = {
    "ext_pack_sequences": lambda sf_dir: oracle_pack_sequences(
        footer_rows(sf_dir, "documents")
    ),
    "ext_curation_pipeline": lambda sf_dir: _curation_oracle(
        footer_rows(sf_dir, "documents")
    ),
}
