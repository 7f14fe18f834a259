"""data_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference document-ETL dataflow
(`/root/reference`, surveyed in SURVEY.md) as idiomatic Spark DataFrame /
SQL operators, plus the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) required by the north star.

Layout:
    sources/    — explicit-schema table loaders for the test parquet tables
    functions/  — reusable column expressions (text normalization, vectors)
    operators/  — composite operators (chunking, dedup, merge-by-key, knn)
    plans/      — the query registry: name -> (spark fn, duckdb oracle sql)
    streaming/  — incremental / Structured Streaming layer
    multimodal/ — binary-column (image/audio) plumbing with stubbed decode
"""

__version__ = "0.1.0"
