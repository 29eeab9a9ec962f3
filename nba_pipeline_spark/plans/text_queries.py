"""Text-analysis queries over the documents table (SURVEY.md §2.10 X5;
BASELINE north star: language ID, quality scoring, token counting,
fingerprinting).

Everything is JVM-side Column expressions (functions.text) — a 100 TB
document scan runs at parquet-read speed with zero Python crossings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources import load_table
from ..session import tune
from .queries import register

# DuckDB-side tokenizer identical to functions.text.tokenize.
_DUCK_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "documents")


# --- X5: word frequency (tokenize -> explode -> count) ------------------------

def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = docs.select(F.explode(TX.tokenize(F.col("text"))).alias("word"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


register(
    "q_text_tokens",
    q_text_tokens,
    f"SELECT word, count(*) AS n FROM (SELECT unnest({_DUCK_TOKS}) AS word FROM documents) GROUP BY word",
)


# --- token counting: whitespace + BPE-ish regex -------------------------------

def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        TX.token_count_ws(F.col("text")).alias("n_ws"),
        TX.token_count_bpe_ish(F.col("text")).alias("n_bpe"),
    )


register(
    "q_token_count",
    q_token_count,
    f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKS}) AS INT) AS n_ws,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS n_bpe
    FROM documents
    """,
)


# --- quality scoring ----------------------------------------------------------

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("__toks", TX.tokenize(F.col("text")))
    q = TX.quality_score(F.col("text"), F.col("__toks"))
    return docs.select(
        "doc_id",
        q["n_chars_q"].alias("n_chars_q"),
        q["n_tokens"].alias("n_tokens"),
        F.round(q["stop_ratio"], 4).alias("stop_ratio"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        F.round(q["mean_tok_len"], 4).alias("mean_tok_len"),
    )


_SW = "['the','a','an','of','to','and','in','is','it','that']"

register(
    "q_text_quality",
    q_text_quality,
    f"""
    WITH t AS (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars_q,
           CAST(len(toks) AS INT) AS n_tokens,
           ROUND(len(list_filter(toks, x -> list_contains({_SW}, x)))
                 * 1.0 / greatest(len(toks), 1), 4) AS stop_ratio,
           ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                 * 1.0 / greatest(length(text), 1), 4) AS punct_ratio,
           CASE WHEN toks IS NULL THEN NULL
                ELSE ROUND(COALESCE(list_sum(list_transform(toks, x -> length(x))) * 1.0, 0.0)
                           / greatest(len(toks), 1), 4)
           END AS mean_tok_len
    FROM t
    """,
)


# --- language ID (marker-token heuristic) -------------------------------------

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("__toks", TX.tokenize(F.col("text")))
    return docs.select("doc_id", "lang", TX.lang_id(F.col("__toks")).alias("lang_pred"))


def _marker_hits(lang: str) -> str:
    markers = "[" + ",".join(f"'{m}'" for m in TX.LANG_MARKERS[lang]) + "]"
    return f"len(list_filter(toks, x -> list_contains({markers}, x)))"


register(
    "q_lang_id",
    q_lang_id,
    f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
    h AS (SELECT doc_id, lang,
                 {_marker_hits('de')} AS de_h, {_marker_hits('en')} AS en_h,
                 {_marker_hits('es')} AS es_h, {_marker_hits('fr')} AS fr_h
          FROM t)
    SELECT doc_id, lang,
           CASE WHEN de_h IS NULL THEN 'und'
                WHEN greatest(de_h, en_h, es_h, fr_h) = 0 THEN 'und'
                WHEN de_h = greatest(de_h, en_h, es_h, fr_h) THEN 'de'
                WHEN en_h = greatest(de_h, en_h, es_h, fr_h) THEN 'en'
                WHEN es_h = greatest(de_h, en_h, es_h, fr_h) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM h
    """,
)


# --- document fingerprint -----------------------------------------------------

def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


register(
    "q_fingerprint",
    q_fingerprint,
    # COALESCE: DuckDB array_to_string([]) is NULL while Spark concat_ws
    # of an empty array is '' — empty docs must fingerprint as md5('')
    # on both engines; NULL text stays NULL.
    f"""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                ELSE md5(COALESCE(array_to_string(list_sort(list_distinct({_DUCK_TOKS})), ' '), ''))
           END AS fp
    FROM documents
    """,
)


# --- TF-IDF keyword extraction + inverted index (round 5) ---------------------

def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf) off one explode of the tokenized corpus —
    map-side partial-agg'd; the shared front of the retrieval pair.

    Pinned: both consumers reference it twice (the per-doc frame AND
    its term-level aggregate) — un-pinned, Catalyst re-derives the
    whole tokenize+explode corpus pass per reference (2 scans in the
    dumped plan). The pinned frame is the deduped (doc, term) surface,
    re-tokenizing beats re-scanning only when tokenization is free —
    it is not at 100 TB."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = docs.select(
        "doc_id", F.explode(TX.tokenize(F.col("text"))).alias("term")
    )
    return (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by an integer-exact
    tf-idf surrogate — score_ppm = (tf × 1e6) div df (term frequency
    up-weighted, document frequency down-weighted; BIGINT floor-div so
    the ranking is hash-exact on any engine — a float idf log would sit
    on rounding grids). Scale: one corpus explode + a (doc,term) agg, a
    vocab-sized df frame joined back on term (AQE broadcasts small
    vocabularies), and a per-doc window bounded at 3 — no global sort."""
    from pyspark.sql import Window

    tf = _tf(spark, sf_dir)
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfq, "term").withColumn(
        "score_ppm", F.expr("(tf * CAST(1000000 AS BIGINT)) div df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score_ppm")
    )


register(
    "q_tfidf_keywords",
    q_tfidf_keywords,
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
               WHERE text IS NOT NULL),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                 (tf.tf * CAST(1000000 AS BIGINT)) // dfq.df AS score_ppm
          FROM tf JOIN dfq USING (term)),
    r AS (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_ppm DESC, term ASC) AS rn
          FROM s)
    SELECT doc_id, term, tf, df, score_ppm FROM r WHERE rn <= 3
    """,
)


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index: per term, document frequency, total
    term frequency, and the first-10 posting list (sorted doc ids,
    comma-joined). The capped postings are built through a per-term
    row_number window BEFORE any collect — a stopword's full posting
    list (O(corpus) docs at 100 TB) is never materialized in one row;
    full stats come from the uncapped aggregate, joined on term."""
    from pyspark.sql import Window

    tf = _tf(spark, sf_dir)
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    w = Window.partitionBy("term").orderBy(F.col("doc_id").asc())
    capped = tf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    postings = capped.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings")
    )
    return stats.join(postings, "term").select("term", "df", "total_tf", "postings")


register(
    "q_inverted_index",
    q_inverted_index,
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
               WHERE text IS NOT NULL),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                     CAST(SUM(tf) AS BIGINT) AS total_tf
              FROM tf GROUP BY 1),
    r AS (SELECT term, doc_id,
                 row_number() OVER (PARTITION BY term ORDER BY doc_id ASC) AS rn
          FROM tf),
    p AS (SELECT term,
                 array_to_string(
                   list_transform(list_sort(list(doc_id)), x -> CAST(x AS VARCHAR)),
                   ',') AS postings
          FROM r WHERE rn <= 10 GROUP BY term)
    SELECT s.term, s.df, s.total_tf, p.postings
    FROM stats s JOIN p USING (term)
    """,
)


# ---------------------------------------------------------------------
# r8: retrieval chunking — overlapping token windows per document, the
# RAG-ingestion shape (each chunk goes on to embedding + the ANN index
# lakes; the overlap keeps answers that straddle a boundary findable).
# ---------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: windows of {CHUNK_TOKENS}
    tokens every {CHUNK_STRIDE} (the trailing window may be shorter;
    empty/NULL docs yield no chunks). One narrow pass — tokenize,
    build the start list with a guarded sequence(), posexplode, slice
    — zero shuffles, zero UDFs; at 100 TB this is a pure scan stage
    feeding the embedding step. Chunk identity is md5 of the joined
    tokens so the gate proves exact chunk CONTENT, not just counts."""
    tune(spark)
    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    toks = TX.tokenize(F.col("text"))
    staged = docs.select("doc_id", toks.alias("toks")).withColumn(
        "starts",
        F.when(
            F.size("toks") > 0,
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE)),
        ).otherwise(F.array().cast("array<int>")),
    )
    exploded = staged.select(
        "doc_id", "toks", F.posexplode("starts").alias("chunk_idx", "s")
    )
    chunk = F.slice(F.col("toks"), F.col("s") + 1, CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


register(
    "q_text_chunks",
    q_text_chunks,
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
               WHERE text IS NOT NULL),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, len(toks), {CHUNK_STRIDE})) AS st
          FROM t),
    ix AS (SELECT doc_id, toks, st,
                  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY st)
                       - 1 AS INT) AS chunk_idx
           FROM s)
    SELECT doc_id, chunk_idx,
           CAST(len(toks[(st + 1):(st + {CHUNK_TOKENS})]) AS INT) AS n_tokens,
           md5(array_to_string(toks[(st + 1):(st + {CHUNK_TOKENS})], ' ')) AS chunk_md5
    FROM ix
    """,
)
