"""End-to-end training-corpus pipeline (BASELINE north star).

One declarative plan chaining the stages a 100 TB pre-training data
pipeline runs: tokenize -> language-ID gate -> quality gate -> exact
near-dup removal -> per-source corpus stats. Every stage is a JVM
Column expression (functions.text) reused verbatim from its standalone
query, so the composite inherits each stage's proven oracle parity.

Physical shape: the whole filter chain is ONE narrow pass over the
scan (no shuffle until dedup); the dedup window shuffles once on the
fingerprint; the final per-source rollup is a partial-agg'd groupBy on
a low-cardinality key. At 100 TB: filters prune early (cheap gates
first would matter if lang_id were expensive — it's a marker-token
count), and the only wide ops are the two keyed shuffles any engine
needs for dedup + rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.partitioning import fan_out, under_parallelized
from ..session import tune
from ..sources import load_table
from .queries import register
from .text_queries import _DUCK_TOKS, _marker_hits

MIN_TOKENS = 20


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    raw = load_table(spark, sf_dir, "documents")
    small = under_parallelized(raw)
    docs = fan_out(raw).withColumn("__toks", TX.tokenize(F.col("text")))
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        TX.lang_id(F.col("__toks")).alias("lang_pred"),
        F.size(F.col("__toks")).alias("n_tokens"),
    )
    if small:
        # Single-row-group corpus: Catalyst pushes the lang/length
        # filter below the fan_out repartition to the one-partition
        # scan, serializing (and double-evaluating) the scoring
        # expressions on one core. Pinning the scored projection with
        # a lazy localCheckpoint keeps scoring 32-way and once-only.
        # At scale the scan is already parallel, fan_out is a no-op,
        # and that same pushdown is a WIN (filter early at the scan) —
        # so the pin stays off.
        scored = scored.localCheckpoint(eager=False)
    kept = scored.filter(
        (F.col("lang_pred") == "en") & (F.col("n_tokens") >= MIN_TOKENS)
    )
    # Fingerprint as a real column BEFORE the window: a non-attribute
    # expression in partitionBy is re-evaluated outside codegen; as a
    # projected column it's computed once per row, map-side.
    kept = kept.withColumn("__fp", TX.fingerprint(F.col("text")))
    # exact dedup: keep the lowest doc_id per canonical fingerprint
    w = Window.partitionBy(F.col("__fp")).orderBy(F.asc("doc_id"))
    deduped = kept.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


register(
    "q_corpus_pipeline",
    q_corpus_pipeline,
    f"""
    WITH t AS (SELECT doc_id, source, text, {_DUCK_TOKS} AS toks FROM documents),
    h AS (SELECT doc_id, source, text, toks,
                 {_marker_hits('de')} AS de_h, {_marker_hits('en')} AS en_h,
                 {_marker_hits('es')} AS es_h, {_marker_hits('fr')} AS fr_h,
                 len(toks) AS n_tokens
          FROM t),
    kept AS (
      SELECT doc_id, source, text, n_tokens FROM h
      WHERE de_h IS NOT NULL AND greatest(de_h, en_h, es_h, fr_h) > 0
        AND de_h < greatest(de_h, en_h, es_h, fr_h)
        AND en_h = greatest(de_h, en_h, es_h, fr_h)
        AND n_tokens >= {MIN_TOKENS}),
    deduped AS (
      SELECT * FROM (
        SELECT kept.*, ROW_NUMBER() OVER (
          PARTITION BY CASE WHEN text IS NULL THEN NULL
            ELSE md5(COALESCE(array_to_string(list_sort(list_distinct({_DUCK_TOKS})), ' '), ''))
          END ORDER BY doc_id ASC) AS rn
        FROM kept) z
      WHERE rn = 1)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_tokens), 4) AS avg_tokens
    FROM deduped GROUP BY source
    """,
)
