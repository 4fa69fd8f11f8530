"""cs_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
CS-Pipeline (xarray/pandas climate ETL, see SURVEY.md) as idiomatic
Spark DataFrame operators, plus LLM-data-pipeline extension operators
(dedup, similarity search, text analysis, multimodal plumbing,
streaming) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (AQE, UTC, tuned shuffle)
    tables.py     loaders for the driver's parquet tables
    functions/    constants + scalar Column-expression registry
    operators/    relational/spatial/agg/join/window/dedup/similarity ops
    sources/      scan helpers (multi-file parquet, tolerant CSV, GeoJSON)
    plans/        driver-side planning (request grouping, agg schema compile)
    streaming/    Structured Streaming surface (windows, watermark, dedup)
"""

__version__ = "0.1.0"
