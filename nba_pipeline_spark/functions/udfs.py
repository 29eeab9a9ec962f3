"""Declared UDF escape hatches (SURVEY §2.12).

Policy: the core operator surface uses ZERO Python UDFs — every
reference ``.apply`` compiles to built-in Column expressions. These are
the sanctioned escapes for work the JVM genuinely can't express,
all Arrow-vectorized (never row-at-a-time):

- ``normalize_embedding``: pandas_udf scalar — numpy batch math over
  array columns (the pattern for model-adjacent feature transforms).
- ``zscore_per_group``: applyInPandas grouped-map — per-group pandas
  logic with the group shuffled to one worker (UDAF-shaped).
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
