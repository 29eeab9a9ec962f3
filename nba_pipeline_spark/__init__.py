"""nba_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference batch ETL pipeline
(oseghalepatrick/nba_pipeline): staged ingest -> raw parquet lake ->
transformed tables, plus an extended large-scale surface (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Design rules (see SURVEY.md §1.3/§4):
- Unit of data is ``pyspark.sql.DataFrame`` over Parquet; no RDDs.
- Explicit schemas at every IO boundary; inference only at ingest edges.
- Zero row-at-a-time Python UDFs in the core path — every reference
  ``.apply`` compiles to built-in Column expressions so Catalyst keeps
  predicate pushdown / codegen. Pandas UDFs only for genuinely
  non-relational work (multimodal decode, custom stateful streaming).
- Window operators always take an explicit partition + ordering column
  (the reference relied on scrape order; we require a ``seq`` contract).
"""

__version__ = "0.1.0"
