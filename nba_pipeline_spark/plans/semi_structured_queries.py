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


# --- X2 extension: higher-order function breadth over numeric arrays ----------

def q_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order breadth over embeddings: filter (count of
    positive coords), exists / forall (range predicates), array
    min/max, sort+slice (top-3 coords), distinct-after-transform
    (sign cardinality). Everything JVM-side, narrow, codegen'd. The
    top-3 list is serialized as micro-unit integers — double-to-string
    formatting is NOT canonical across engines (Spark says 1.0E-6,
    DuckDB 0.000001), integers are."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    top3 = F.slice(F.array_sort(v, lambda a, b: F.when(a < b, 1).when(a > b, -1).otherwise(0)), 1, 3)
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.exists(v, lambda x: x > 0.9).alias("any_gt9"),
        F.forall(v, lambda x: F.abs(x) <= 1.5).alias("all_in_range"),
        F.round(F.array_max(v), 6).alias("mx"),
        F.round(F.array_min(v), 6).alias("mn"),
        F.concat_ws(
            ",", F.transform(top3, lambda x: F.round(x * 1000000).cast("long").cast("string"))
        ).alias("top3_micro"),
        F.size(F.array_distinct(F.transform(v, lambda x: F.signum(x)))).cast("int").alias("n_signs"),
    )


register(
    "q_hof_funcs",
    q_hof_funcs,
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id,
           CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(v, x -> x > 0.9)) > 0 AS any_gt9,
           len(list_filter(v, x -> abs(x) > 1.5)) = 0 AS all_in_range,
           ROUND(list_max(v), 6) AS mx,
           ROUND(list_min(v), 6) AS mn,
           array_to_string(list_transform(list_sort(v, 'DESC')[1:3],
                             x -> CAST(CAST(round(x * 1000000, 0) AS BIGINT) AS VARCHAR)), ',')
             AS top3_micro,
           CAST(len(list_distinct(list_transform(v, x -> sign(x)))) AS INT) AS n_signs
    FROM e
    """,
)


# --- X1 extension: VARIANT semi-structured type (Spark 4) ---------------------

def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: try_parse_json
    builds the binary variant (NULL on junk instead of dying — the
    open-schema analog of the try_* family), variant_get extracts typed
    fields by JSONPath (the try_ form: a {"k": "abc"} payload NULLs the
    cast instead of failing the job). Versus from_json: no schema declared up front,
    the value keeps its own structure — the right ingest type when
    event payloads drift. The oracle guards junk with json_valid, since
    DuckDB's JSON functions error on malformed input."""
    ev = _t(spark, sf_dir, "events")
    v = F.try_parse_json(F.col("props"))
    return ev.select(
        "event_id",
        # double, not int: variant int-casts TRUNCATE 3.5 -> 3 where a
        # text-path TRY_CAST rounds -> 4; double agrees everywhere
        F.try_variant_get(v, "$.k", "double").alias("k_num"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_str"),
        v.isNull().alias("unparseable"),
    )


register(
    "q_variant_extract",
    q_variant_extract,
    """
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) END AS k_num,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.missing') END AS missing_str,
           (props IS NULL OR NOT json_valid(props)) AS unparseable
    FROM events
    """,
)
