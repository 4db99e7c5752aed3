"""simple_data_engineering_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference pipeline ``emmanuel24699/
Simple-Data-Engineering-Project`` (an Airflow + pandas + PostgreSQL cocoa
supply-chain ETL), re-expressed as declarative DataFrame / Spark SQL plans
so Catalyst + Tungsten pick the physical strategy.

Layout
------
- ``session``   — SparkSession builder (AQE on, UTC, tuned shuffle partitions)
- ``schemas``   — explicit StructTypes for the cocoa contract + test tables
- ``sources``   — csv/parquet/jsonl readers & writers (scan/sink operators)
- ``operators`` — upsert, dedup (exact/minhash/simhash), joins (broadcast/
                  semi/anti/range/as-of), windows, similarity search, text
                  analysis, multimodal plumbing
- ``functions`` — reusable column expressions (revenue, value_usd, hashes)
- ``plans``     — the query catalog: every SURVEY.md §2 operator as a
                  (spark, sf_dir) -> DataFrame callable plus its DuckDB
                  oracle SQL
- ``streaming`` — Structured Streaming pipelines over the events table
- ``pipeline``  — the batch ETL pipeline (generate → validate → enrich →
                  stage → upsert → archive), reference-parity behaviors
"""

__version__ = "0.1.0"
