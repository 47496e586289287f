"""emr_flink_example_spark — a PySpark-native analytics engine.

A ground-up Spark reimplementation of the capabilities of the reference
`yhyyz/emr-flink-example` (three Flink Kafka→S3 ingestion jobs), widened to a
full relational query surface (joins, aggregations, window functions, set ops,
streaming windows) plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — all expressed through the DataFrame /
Spark SQL API so Catalyst + Tungsten handle physical planning.

Layout:
    session.py    SparkSession factory with scale-oriented defaults
    config.py     CLI mirroring the reference's scopt Config (Config.scala)
    io.py         table loading / writing helpers over the test parquet data
    sources/      batch + streaming source builders (files, kafka, rate)
    operators/    query builders: relational, dedup, similarity, text, asof
    functions/    column-expression helpers (time derivation, portable hashing)
    plans/        the query catalog: name -> (spark builder, duckdb oracle sql)
    streaming/    reference-parity streaming pipelines (text/parquet/hive sinks)
"""

__version__ = "0.1.0"
