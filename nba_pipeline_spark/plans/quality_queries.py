"""Training-data quality & decontamination queries (BASELINE north
star; the published pipeline ops: n-gram decontamination à la
GPT-3/PaLM appendix C, PII redaction, and Gopher-style repetition
filtering — each as a pure Column-expression plan with a DuckDB
oracle).

Scale shapes:
- decontamination broadcasts the held-out side's distinct shingles
  (tiny: thousands of benchmark docs vs billions of training docs)
  against the exploded train-side shingle stream — zero train-side
  shuffle, the same layout as the published bloom-of-test-ngrams
  decontamination runs, never doc × doc. If the test side ever
  outgrew broadcast, fall back to a shuffle join on fixed-width
  hashed shingles.
- PII redaction and repetition scoring are narrow map-side passes;
  zero shuffles, scan-speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.text import shingles
from ..operators.partitioning import fan_out
from ..session import tune
from ..sources import load_table
from .queries import register

_DUCK_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
_DUCK_SH5 = (
    "list_transform(range(1, greatest(len(toks) - 3, 1)), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))"
)
_DUCK_SH3 = (
    "list_transform(range(1, greatest(len(toks) - 1, 1)), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
)

TEST_SOURCE = "src0"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return fan_out(load_table(spark, sf_dir, "documents"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (source != src0) that
    share any 5-gram with the held-out set (source = src0), with the
    size of the overlap. Distinct shingles per doc BEFORE the join so
    a repeated phrase can't multiply the shuffle; the test side is
    BROADCAST — at 100 TB the held-out benchmark set is thousands of
    docs against billions, so the train-side shingle stream never
    shuffles (the same shape as the published bloom-of-test-ngrams
    decontamination runs). Only the contaminated survivors (a tiny
    fraction) hit the final doc_id aggregation exchange.

    Physical choices (20.3 s -> see BENCH for current): shingles are
    xxhash64'd to int64 INSIDE the per-doc array, so everything past
    the tokenizer — distinct, explode, broadcast hash table, join keys
    — moves 8-byte longs instead of ~40-byte strings (collision odds
    across train×test shingle pairs ~1e-10 at this corpus; at 100 TB
    pair counts, still < 1e-4 per run — below the sampling noise of any
    contamination report). The test side is pre-aggregated to ONE row
    per shingle carrying its collect_set of test docs, which turns the
    final per-doc aggregation from a two-countDistinct expand (2x row
    multiplication through the shuffle) into a plain count + one
    array-flatten distinct."""
    docs = _docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    shingles(TX.tokenize(F.col("text")), 5), lambda s: F.xxhash64(s)
                )
            )
        ).alias("sh"),
    )
    test = (
        sh.filter(F.col("source") == TEST_SOURCE)
        .groupBy("sh")
        .agg(F.collect_set("doc_id").alias("test_docs"))
    )
    train = sh.filter(
        F.col("source").isNotNull() & (F.col("source") != TEST_SOURCE)
    )
    # one row per (train doc, matched shingle): train shingles are
    # distinct per doc and the test side is unique per shingle
    hits = train.join(F.broadcast(test), "sh")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_ngrams"),
        F.size(
            F.array_distinct(F.flatten(F.collect_list("test_docs")))
        ).cast("long").alias("n_test_docs"),
    )


register(
    "q_decontaminate",
    q_decontaminate,
    f"""
    WITH t AS (SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, source, unnest(list_distinct({_DUCK_SH5})) AS sh FROM t),
    test AS (SELECT sh, doc_id AS test_doc FROM sh WHERE source = '{TEST_SOURCE}'),
    train AS (SELECT doc_id, sh FROM sh
              WHERE source IS NOT NULL AND source <> '{TEST_SOURCE}')
    SELECT train.doc_id, COUNT(DISTINCT train.sh) AS n_shared_ngrams,
           COUNT(DISTINCT test.test_doc) AS n_test_docs
    FROM train JOIN test ON train.sh = test.sh
    GROUP BY train.doc_id
    """,
)


# Patterns kept to the Java-regex ∩ RE2 common subset so both engines
# compile them identically.
_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
_LONGNUM = "[0-9][0-9][0-9]+"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: count + redact emails and long digit runs.
    Result hashed (md5 of redacted text) so the gate proves the exact
    redacted bytes, not just the counts. Clean synthetic text redacts
    nothing; the adversarial junk fixture is where this earns its keep."""
    docs = _docs(spark, sf_dir)
    lower = F.lower(F.col("text"))
    red = F.regexp_replace(
        F.regexp_replace(lower, _EMAIL, "<EMAIL>"), _LONGNUM, "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(lower, F.lit(_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(lower, F.lit(_LONGNUM), F.lit(0))).alias("n_longnums"),
        F.md5(red).alias("redacted_md5"),
    )


register(
    "q_pii_redact",
    q_pii_redact,
    f"""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(len(regexp_extract_all(lower(text), '{_EMAIL}')) AS INT)
           END AS n_emails,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(len(regexp_extract_all(lower(text), '{_LONGNUM}')) AS INT)
           END AS n_longnums,
           md5(regexp_replace(regexp_replace(lower(text), '{_EMAIL}', '<EMAIL>', 'g'),
                              '{_LONGNUM}', '<NUM>', 'g')) AS redacted_md5
    FROM documents
    """,
)


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: fraction of duplicate 3-grams per
    doc (1 - distinct/total); docs above threshold get flagged. NULL
    ratio (fewer than 3 tokens) flags 0 on both engines."""
    docs = _docs(spark, sf_dir)
    sh = shingles(TX.tokenize(F.col("text")), 3)
    n_total = F.size(sh)
    n_distinct = F.size(F.array_distinct(sh))
    ratio = F.round(
        F.lit(1.0) - F.try_divide(n_distinct * F.lit(1.0), n_total), 4
    )
    return docs.select(
        "doc_id",
        n_total.alias("n_shingles"),
        ratio.alias("dup_ratio"),
        F.when(ratio >= 0.2, F.lit(1)).otherwise(F.lit(0)).alias("flagged"),
    )


register(
    "q_repetition_filter",
    q_repetition_filter,
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, {_DUCK_SH3} AS sh FROM t)
    SELECT doc_id,
           CAST(len(sh) AS INT) AS n_shingles,
           ROUND(1.0 - len(list_distinct(sh)) * 1.0 / nullif(len(sh), 0), 4) AS dup_ratio,
           CASE WHEN ROUND(1.0 - len(list_distinct(sh)) * 1.0 / nullif(len(sh), 0), 4) >= 0.2
                THEN 1 ELSE 0 END AS flagged
    FROM s
    """,
)
