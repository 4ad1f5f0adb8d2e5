"""PySpark-native analytics engine with the query and data-processing
capabilities of PoliticalDog/python-etl-rest-api, re-expressed Spark-first.

The reference (read-only at /root/reference) is a pandas ETL + MySQL star
schema + FastAPI service. This package re-expresses every operator it
performs as declarative DataFrame/SQL plans that Catalyst can optimize
(predicate pushdown, column pruning, broadcast joins, partial aggregation),
plus the LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
    session.py    - SparkSession builder + runtime-conf conventions
    schemas.py    - explicit StructTypes (never inferSchema in production)
    sources/      - CSV / Parquet readers, testdata table loader
    functions/    - expression helpers (pure Column -> Column, no UDFs on
                    the reference surface)
    operators/    - DataFrame -> DataFrame operators: clean, analytics,
                    load, dedup, similarity, text, multimodal, first100
    plans/        - plan introspection (assert pushdown / broadcast / codegen)
    streaming/    - Structured Streaming variants of the batch operators
    api/          - FastAPI orchestration shell (Spark jobs via REST)
"""

__version__ = "0.1.0"
