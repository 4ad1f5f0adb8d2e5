"""Explicit schemas for the reference domain (SURVEY.md section 1.2).

The reference's schema is three-layered: pandas-inferred on CSV read, forced
by explicit casts, fixed by MySQL DDL (reference sql/01_schema.sql:5-19).
Here the raw layer is an explicit all-string StructType (never inferSchema
in production - inference requires an extra pass over 100 TB and is
non-deterministic under sampling), and the curated layer mirrors the DDL.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw CSV layout of data_prueba_técnica.csv (reference etl/03_transform_and_load.py:30).
# Everything lands as string; lenient casts happen in operators/clean.py.
CHARGES_RAW_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("company_id", T.StringType(), True),
    T.StructField("amount", T.StringType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("created_at", T.StringType(), True),
    T.StructField("paid_at", T.StringType(), True),
])

# Curated fact table - mirrors DDL `charges` (reference sql/01_schema.sql:11-19):
# id VARCHAR(40) PK, company_id VARCHAR(40) NOT NULL FK, amount DECIMAL(16,2)
# NOT NULL, status VARCHAR(30) NOT NULL, created_at TIMESTAMP NOT NULL,
# updated_at TIMESTAMP NULL.
CHARGES_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("company_id", T.StringType(), False),
    T.StructField("amount", T.DecimalType(16, 2), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("created_at", T.TimestampType(), False),
    T.StructField("updated_at", T.TimestampType(), True),
])

# Curated dimension - mirrors DDL `companies` (reference sql/01_schema.sql:5-8).
COMPANIES_SCHEMA = T.StructType([
    T.StructField("company_id", T.StringType(), False),
    T.StructField("company_name", T.StringType(), False),
])

# DECIMAL(16,2) max value - the pre-cast overflow guard threshold
# (reference etl/03_transform_and_load.py:51-52).
DECIMAL_16_2_MAX = 99999999999999.99

# What the reference's pandas 3.0 to_datetime(errors='coerce') actually
# does (verified against df_critical.csv): it infers ONE format from the
# first element (%Y-%m-%d here) and coerces every mismatch to NaT - the
# three quarantined missing_created_at rows are '2019-02-27T00:00:00',
# '20190516' and '20190121' in the raw CSV. Golden parity therefore
# requires STRICT single-format parsing for the reference pipeline.
REFERENCE_PANDAS_FORMATS = ("yyyy-MM-dd",)

# The engine's own lenient multi-format parse (catalog op F2) - the
# better-than-reference behavior for dirty feeds, oracle-checked
# separately. NOT used for golden replication.
LENIENT_TIMESTAMP_FORMATS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
    "yyyyMMdd",
    "yyyy/MM/dd",
)

# Driver testdata tables (TESTDATA.md)
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
