"""Text-analysis operators for training-data pipelines (SURVEY §2.11 /
BASELINE north star) over the `documents` table, with DuckDB oracles.

Everything is built-in JVM expressions (regexp/array/higher-order
functions) — no Python UDFs — so the ops stay inside whole-stage codegen
and scale linearly with one narrow pass over the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from relational_to_doc_oriented_nosql_migrator_spark.operators.common import (
    dec_avg,
    dec_sum,
    sql_dec_avg,
    sql_dec_sum,
    t,
)

# ASCII-only stopword votes per language (shared with the oracle).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu",
           "den"],
    "fr": ["le", "les", "et", "est", "des", "une", "du", "dans", "pour",
           "que"],
    "es": ["el", "los", "de", "que", "y", "en", "un", "es", "por", "con"],
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish segmentation: alnum runs or single non-space symbols.
BPE_ISH_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens_col(col: Column) -> Column:
    """Whitespace tokens of lowercased trimmed text (shared definition)."""
    return F.split(F.lower(F.trim(col)), TOKEN_SPLIT_RE)


SQL_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"


def docs_tokenized(spark, sf_dir, spread: bool = False) -> DataFrame:
    """The shared tokenization scan: (doc_id, text, lang, source, tk).

    Tokenization dominates CPU at corpus scale, so multi-stage pipelines
    (ext_curation_pipeline) compute this frame ONCE, persist it, and thread
    it through the `*_from` stage builders instead of re-tokenizing per
    stage.

    spread=True repartitions the RAW scan before tokenizing — required
    before a persist (the cache materializes in its input's layout) or any
    multi-consumer use, so a few-file corpus doesn't pin tokenization to a
    few cores. The repartition must precede the projection:
    `select(expensive).repartition(n)` leaves the work below the exchange.
    """
    docs = t(spark, sf_dir, "documents")
    if spread:
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.select(
        "doc_id", "text", "lang", "source",
        tokens_col(F.col("text")).alias("tk"),
    )


def q_ext_text_tokens(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex segmentation."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_seen"),
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0)).alias(
            "n_bpe_ish"
        ),
    )


def q_ext_text_stats(spark, sf_dir):
    """Corpus stats per (lang, source): doc counts, char/token averages."""
    docs = t(spark, sf_dir, "documents")
    enriched = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
    )
    return enriched.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dec_sum("n_chars", 0).alias("sum_chars"),
        dec_avg("n_chars").alias("avg_chars"),
        dec_avg("n_tokens").alias("avg_tokens"),
    )


def text_quality_from(docs_tk: DataFrame) -> DataFrame:
    """Quality features over a pre-tokenized (doc_id, text, tk) frame."""
    toks = F.col("tk")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    stop = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS["en"]))
    )
    punct_ratio = F.round(punct.cast("double") / n_chars, 6)
    stop_ratio = F.round(stop.cast("double") / n_tokens, 6)
    return docs_tk.select(
        "doc_id",
        n_chars.alias("n_chars_seen"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (
            (n_chars >= 100) & (punct_ratio <= F.lit(0.1))
        ).alias("keep"),
    )


def q_ext_text_quality(spark, sf_dir):
    """Per-doc quality features: length, punctuation ratio, stopword ratio,
    and a keep/drop flag — the classic pretraining quality filter shape."""
    return text_quality_from(docs_tokenized(spark, sf_dir))


def q_ext_text_langid(spark, sf_dir):
    """Language-ID heuristic: CJK-character ratio, else stopword votes with
    a deterministic preference order (en > de > es > fr)."""
    docs = t(spark, sf_dir, "documents")
    alpha = F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+"), 0)

    def _voter(words):
        return lambda x: x.isin(*words)

    votes = {
        lang: F.size(F.filter(alpha, _voter(words)))
        for lang, words in STOPWORDS.items()
    }
    han = F.length(F.regexp_replace("text", r"[^\p{IsHan}]", ""))
    pred = (
        F.when(han * 5 > F.length("text"), F.lit("zh"))
        .when(
            (votes["en"] >= votes["de"]) & (votes["en"] >= votes["es"])
            & (votes["en"] >= votes["fr"]), F.lit("en"))
        .when((votes["de"] >= votes["es"]) & (votes["de"] >= votes["fr"]),
              F.lit("de"))
        .when(votes["es"] >= votes["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        votes["en"].alias("votes_en"),
        votes["de"].alias("votes_de"),
        votes["es"].alias("votes_es"),
        votes["fr"].alias("votes_fr"),
        pred.alias("pred_lang"),
    )


def q_ext_text_fingerprint(spark, sf_dir):
    """Document fingerprint: minimum md5 over word 5-gram shingles (a
    rolling-hash-style content signature, stable under whitespace noise)."""
    docs = t(spark, sf_dir, "documents")
    fp = F.expr(
        "array_min(transform(sequence(1, greatest(size(toks) - 4, 1)),"
        " i -> md5(concat_ws(' ', slice(toks, i, 5)))))"
    )
    return (
        docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .select("doc_id", fp.alias("fingerprint"))
    )


def q_ext_split_assign(spark, sf_dir):
    """Deterministic train/val/test split: md5-bucket the doc id so the
    assignment is stable across runs, engines, and repartitioning (a
    seeded df.sample would be engine-specific RNG). 90/5/5."""
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
    return docs.select("doc_id", bucket.alias("bucket"),
                       split.alias("split"))


def q_ext_token_bigrams(spark, sf_dir):
    """Corpus-wide token-pair frequencies (the merge-candidate counting
    step of BPE training): adjacent-token bigrams exploded and counted."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    bigrams = F.expr(
        "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
        " (x, i) -> concat(x, ' ', element_at(tk, i + 2)))"
    )
    return (
        docs.select(toks.alias("tk"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


QUERIES = {
    "ext_text_tokens": q_ext_text_tokens,
    "ext_split_assign": q_ext_split_assign,
    "ext_token_bigrams": q_ext_token_bigrams,
    "ext_text_stats": q_ext_text_stats,
    "ext_text_quality": q_ext_text_quality,
    "ext_text_langid": q_ext_text_langid,
    "ext_text_fingerprint": q_ext_text_fingerprint,
}


def _votes_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        "len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),"
        f" x -> list_contains([{words}], x)))"
    )


ORACLES = {
    "ext_split_assign": """
SELECT doc_id,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
         AS bucket,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                 % 100 < 90 THEN 'train'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                 % 100 < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    "ext_token_bigrams": f"""
WITH tk AS (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents)
SELECT bigram, COUNT(*) AS n FROM (
  SELECT unnest([tk[i] || ' ' || tk[i + 1]
                 for i in generate_series(1, greatest(len(tk) - 1, 0))])
           AS bigram
  FROM tk
) GROUP BY bigram
""",
    "ext_text_tokens": f"""
SELECT doc_id, length(text) AS n_chars_seen,
       len({SQL_TOKENS}) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
         AS n_bpe_ish
FROM documents
""",
    "ext_text_stats": f"""
SELECT lang, source, COUNT(*) AS n_docs,
       {sql_dec_sum('n_chars', 0)} AS sum_chars,
       {sql_dec_avg('n_chars')} AS avg_chars,
       {sql_dec_avg(f'len({SQL_TOKENS})')} AS avg_tokens
FROM documents GROUP BY lang, source
""",
    "ext_text_quality": f"""
SELECT doc_id, length(text) AS n_chars_seen,
       len({SQL_TOKENS}) AS n_tokens,
       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
             / length(text), 6) AS punct_ratio,
       round(len(list_filter({SQL_TOKENS},
                 x -> list_contains(['the','and','of','to','in','is','that',
                                     'it','was','for'], x)))::DOUBLE
             / len({SQL_TOKENS}), 6) AS stopword_ratio,
       length(text) >= 100 AND
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
               / length(text), 6) <= 0.1 AS keep
FROM documents
""",
    "ext_text_langid": f"""
SELECT doc_id,
       {_votes_sql('en')} AS votes_en,
       {_votes_sql('de')} AS votes_de,
       {_votes_sql('es')} AS votes_es,
       {_votes_sql('fr')} AS votes_fr,
       CASE
         WHEN length(regexp_replace(text, '[^\\p{{Han}}]', '', 'g')) * 5
              > length(text) THEN 'zh'
         WHEN {_votes_sql('en')} >= {_votes_sql('de')}
          AND {_votes_sql('en')} >= {_votes_sql('es')}
          AND {_votes_sql('en')} >= {_votes_sql('fr')} THEN 'en'
         WHEN {_votes_sql('de')} >= {_votes_sql('es')}
          AND {_votes_sql('de')} >= {_votes_sql('fr')} THEN 'de'
         WHEN {_votes_sql('es')} >= {_votes_sql('fr')} THEN 'es'
         ELSE 'fr'
       END AS pred_lang
FROM documents
""",
    "ext_text_fingerprint": f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents)
SELECT doc_id,
       list_min([md5(array_to_string(tk[i:i+4], ' '))
                 for i in generate_series(1, greatest(len(tk) - 4, 1))])
         AS fingerprint
FROM toks
""",
}
