"""Declared UDF escape hatches (SURVEY §2.12).

Policy: the core operator surface uses ZERO Python UDFs — every
reference ``.apply`` compiles to built-in Column expressions. These are
the sanctioned escapes for work the JVM genuinely can't express,
all Arrow-vectorized (never row-at-a-time):

- ``normalize_embedding``: pandas_udf scalar — numpy batch math over
  array columns (the pattern for model-adjacent feature transforms).
- ``zscore_per_group``: applyInPandas grouped-map — per-group pandas
  logic with the group shuffled to one worker (UDAF-shaped).
- ``weighted_mean``: pandas_udf grouped-agg — a true UDAF: Arrow
  batches in, one scalar out per group, usable in groupBy().agg and
  over windows.
- ``ngram_udtf``: Python UDTF (table function) — one row in, many
  rows out with a declared schema; the lateral-join shape for Python
  tokenizers/parsers that genuinely can't be `split`+`explode`.
- ``register_parity_udfs``: spark.udf.register bridge so SQL text can
  call engine functions; used by parity tests only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def normalize_embedding(batch: pd.Series) -> pd.Series:
    """L2-normalize embeddings, one Arrow batch at a time."""

    def norm_one(v):
        a = np.asarray(v, dtype=np.float64)
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0.0 else a.tolist()

    return batch.map(norm_one)


@F.pandas_udf(T.StringType())
def nfc_normalize(batch: pd.Series) -> pd.Series:
    """Unicode NFC normalization, one Arrow batch at a time — a
    GENUINE UDF requirement: Spark SQL has no ICU normalizer builtin
    (collations compare normalized, but no function returns the
    normalized string). Every serious text pipeline canonicalizes
    unicode before hashing/dedup, else 'café' (NFC) and 'café' (NFD)
    land in different dedup buckets. NULL in -> NULL out."""
    import unicodedata

    return batch.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def zscore_per_group(df: DataFrame, keys: list[str], value_col: str, out: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score within each group.

    (Expressible with window functions too — kept as the canonical
    grouped-map example; real uses are per-group model scoring etc.)
    """
    schema = T.StructType(
        df.schema.fields + [T.StructField(out, T.DoubleType())]
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        sd = v.std(ddof=1)
        pdf[out] = (v - v.mean()) / sd if sd and not np.isnan(sd) else 0.0
        return pdf

    return df.groupBy(*keys).applyInPandas(apply, schema)


# DataType objects, not DDL strings: string return types parse via the
# active SparkContext, which doesn't exist yet at module import
@F.pandas_udf(T.DoubleType())
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF): weighted mean of ``v`` by ``w``.
    Arrow ships each group's columns as one batch; the return is a
    scalar per group. NULL weights/values are excluded pairwise, like
    SQL aggregates."""
    mask = v.notna() & w.notna()
    tw = float(w[mask].sum())
    return float((v[mask] * w[mask]).sum() / tw) if tw != 0.0 else None


@F.udtf(
    returnType=T.StructType(
        [T.StructField("ngram", T.StringType()), T.StructField("pos", T.IntegerType())]
    )
)
class ngram_udtf:
    """Python UDTF: emit the word bigrams of a text with positions.
    The table-function shape (one row -> many typed rows, usable in
    FROM/LATERAL) for parsers that outgrow split+explode. Plumbing
    demo — a regex bigram IS expressible builtin, which is why no core
    query uses this."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        words = text.split()
        for i in range(len(words) - 1):
            yield f"{words[i]} {words[i + 1]}", i


def register_parity_udfs(spark: SparkSession) -> None:
    """Expose engine scalar semantics to SQL text (parity testing only —
    registered UDFs are the slow path and stay out of production plans)."""

    def mmss_to_seconds_py(s: str | None) -> int | None:
        if not s or ":" not in s:
            return None
        try:
            m, rest = s.split(":", 1)
            return int(m) * 60 + int(rest.split(".", 1)[0])
        except ValueError:
            return None

    spark.udf.register("mmss_to_seconds_py", mmss_to_seconds_py, T.IntegerType())
