"""Cloud lake/warehouse sinks (SURVEY §2.1 S6/S8).

The reference stages CSV locally, converts to parquet, uploads per
season object to GCS (scrape_data_to_gcs.py:34-46), and provisions —
but never wires — a GCS->BigQuery load (gcs_to_bq_dag.py:6,
IaC/main.tf:45-55). Here both sinks are direct Spark writes: no local
hop, no per-object upload loop — the cluster writes the lake/warehouse
in parallel.

This environment has neither the GCS connector nor the
spark-bigquery-connector on the classpath, so both entry points probe
availability and fail with an actionable message instead of a Py4J
stack trace. The write code itself is the production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ConnectorMissing(RuntimeError):
    pass


def _has_filesystem(df: DataFrame, scheme: str) -> bool:
    sc = df.sparkSession.sparkContext
    try:
        jvm = sc._jvm
        conf = sc._jsc.hadoopConfiguration()
        jvm.org.apache.hadoop.fs.FileSystem.get(jvm.java.net.URI(f"{scheme}://probe/"), conf)
        return True
    except Exception:
        return False


def write_gcs_parquet(df: DataFrame, bucket: str, prefix: str, partition_cols: list[str]) -> None:
    """S6: the lake write. Replaces upload_to_gcs
    (scrape_data_to_gcs.py:42-46) — executors stream parquet directly to
    ``gs://bucket/prefix/`` partition directories."""
    if not _has_filesystem(df, "gs"):
        raise ConnectorMissing(
            "GCS Hadoop connector (gcs-connector) not on the classpath; "
            "add it via spark.jars.packages=com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.21"
        )
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(f"gs://{bucket}/{prefix}")


def write_bigquery(df: DataFrame, table: str, dataset: str, temp_bucket: str) -> None:
    """S8: the warehouse load the reference intended
    (BigQueryCreateExternalTableOperator import at gcs_to_bq_dag.py:6,
    datasets at IaC/main.tf:45-55) but never implemented."""
    try:
        df.sparkSession._jvm.java.lang.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
    except Exception as e:
        raise ConnectorMissing(
            "spark-bigquery-connector not on the classpath; add "
            "spark.jars.packages=com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.41.0"
        ) from e
    (
        df.write.format("bigquery")
        .option("table", f"{dataset}.{table}")
        .option("temporaryGcsBucket", temp_bucket)
        .mode("overwrite")
        .save()
    )


def save_as_warehouse_table(df: DataFrame, name: str) -> None:
    """Local-mode stand-in for S8: register in the Spark catalog so SQL
    sees the same table surface the BigQuery dataset would expose.

    Drops any stale table AND its orphaned location first: a fresh
    metastore with a leftover warehouse dir otherwise fails
    LOCATION_ALREADY_EXISTS on overwrite."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
    except Exception:
        pass
    df.write.mode("overwrite").saveAsTable(name)
