"""Edge ingest (SURVEY §2.1 S1): the reference's per-page HTML scrape
(``pd.io.html.read_html(url)`` call sites in playerInfo.py:8,
games.py:23,36, playByplay.py:107, boxScores.py:43) re-shaped for a
cluster: a URL frame fanned out over executors via Arrow-batched
``mapInPandas``, each worker fetching and parsing its slice.

The reference fetches serially inside one Airflow task per season; here
10k URLs spread over the cluster and land directly as rows — the edge
is the ONLY place eager/row-wise work is allowed (SURVEY §2.12 policy).

The HTTP fetch itself is STUBBED (`fetch_table_stub`): this environment
has no network and no bs4/lxml; the batching, schema, partitioning and
retry accounting are the real production shape. Swap ``fetcher`` for a
requests+read_html closure in a connected deployment.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("cells", T.ArrayType(T.StringType())),
        T.StructField("fetch_error", T.StringType()),
    ]
)


def fetch_table_stub(url: str) -> list[list[str]]:
    """Deterministic stand-in for requests + read_html: derives a tiny
    'table' from the URL so plumbing is testable offline. Raises for
    urls containing 'bad' to exercise the per-row error channel."""
    if "bad" in url:
        raise ValueError(f"simulated fetch failure for {url}")
    slug = url.rstrip("/").rsplit("/", 1)[-1] or "root"
    return [[slug, str(len(url))], [slug.upper(), str(sum(map(ord, slug)) % 997)]]


def fetch_urls(
    spark: SparkSession,
    urls: list[str],
    fetcher: Callable[[str], list[list[str]]] = fetch_table_stub,
    partitions: int | None = None,
) -> DataFrame:
    """Fan URLs out over the cluster; one output row per scraped table
    row, with a per-URL error column instead of task failure (one dead
    page must not kill a 10k-page ingest)."""
    n_part = partitions or min(len(urls), 64) or 1
    url_df = spark.createDataFrame([(u,) for u in urls], schema="url string").repartition(n_part)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for u in pdf["url"]:
                try:
                    for i, cells in enumerate(fetcher(u)):
                        out.append((u, i, [str(c) for c in cells], None))
                except Exception as e:  # noqa: BLE001 - error channel by design
                    out.append((u, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=["url", "row_idx", "cells", "fetch_error"])

    return url_df.mapInPandas(run, FETCH_RESULT_SCHEMA)
