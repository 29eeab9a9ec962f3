"""JSON / array / map queries (SURVEY.md §2.10 X1-X3).

The reference has no nested data; this is the extended surface for the
events.props JSON column and array-typed intermediates. All higher-order
functions (transform/filter/aggregate) execute in the JVM — arrays never
cross into Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as TX
from ..sources import load_table
from ..session import tune
from .queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


# --- X1: JSON extraction ------------------------------------------------------

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Both paths: path extraction (get_json_object) and typed parse (from_json).
    parsed = ev.withColumn("props_struct", F.from_json("props", PROPS_SCHEMA))
    return parsed.select(
        "event_id",
        # try_cast: junk props must yield NULL, not an ANSI cast abort
        F.get_json_object("props", "$.k").try_cast("int").alias("k_path"),
        F.col("props_struct.k").alias("k_typed"),
    )


register(
    "q_json_extract",
    q_json_extract,
    # k_path models get_json_object+try_cast (string-encoded numbers OK,
    # junk -> NULL); k_typed models from_json's strict typed parse (only
    # JSON integer tokens populate an IntegerType field). json_valid
    # guards keep DuckDB from raising on malformed JSON where Spark
    # returns NULL rows.
    """
    SELECT event_id,
           CASE WHEN json_valid(props)
                     AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k_path,
           CASE WHEN json_valid(props)
                     AND json_type(props, '$.k') IN ('INTEGER', 'BIGINT', 'UBIGINT')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k_typed
    FROM events
    """,
)


# --- X2: array ops ------------------------------------------------------------

def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokenize(F.col("text"))
    not_null = F.col("text").isNotNull()
    # NULL text -> NULL outputs (concat_ws would silently emit '' and
    # aggregate-over-NULL semantics differ across engines)
    first3 = F.when(not_null, F.concat_ws("|", F.slice(toks, 1, 3)))
    total_chars = F.when(
        not_null, F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("bigint")
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        first3.alias("first3"),
        total_chars.alias("total_chars"),
    )


register(
    "q_array_ops",
    q_array_ops,
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           list_contains(toks, 'spark') AS has_spark,
           CASE WHEN toks IS NULL THEN NULL
                ELSE COALESCE(array_to_string(toks[1:3], '|'), '') END AS first3,
           CASE WHEN toks IS NULL THEN NULL
                ELSE COALESCE(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT), 0)
           END AS total_chars
    FROM t
    """,
)


# --- X3: map ops (map build + explode to rows) --------------------------------

def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("bucket"), F.when(F.col("value") >= 100, F.lit("big")).otherwise(F.lit("small")),
    )
    return ev.select("event_id", F.explode(m).alias("key", "val"))


register(
    "q_map_ops",
    q_map_ops,
    """
    SELECT event_id, 'type' AS key, event_type AS val FROM events
    UNION ALL
    SELECT event_id, 'bucket' AS key,
           CASE WHEN value >= 100 THEN 'big' ELSE 'small' END AS val
    FROM events
    """,
)
