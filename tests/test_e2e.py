"""End-to-end: the reference's whole batch flow (extract -> transform ->
load -> query the view), driven through the engine's public operators on
the reference's own CSV - the /etl/run + /view REST flow minus HTTP."""

import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators.analytics import daily_company_totals
from python_etl_rest_api_spark.operators.clean import build_dim_fact, clean_pipeline
from python_etl_rest_api_spark.operators.load import (
    atomic_overwrite,
    insert_ignore,
    write_history_csv,
)
from python_etl_rest_api_spark.sources import read_charges_csv
from python_etl_rest_api_spark.sources.csv_source import ROW_ID

CSV = "/root/reference/data_prueba_técnica.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CSV), reason="reference CSV not present")


def test_full_pipeline_to_view(spark, tmp_path):
    wh = str(tmp_path / "wh")
    raw = read_charges_csv(spark, CSV)
    clean, critical = clean_pipeline(raw, keep_order_col=True)
    clean = clean.cache()
    companies_pairs, charges = build_dim_fact(clean)

    # load: dim via first-seen-wins per PK (INSERT IGNORE), fact as-is
    dim_rows = insert_ignore(
        None,
        clean.select("company_id", "company_name", ROW_ID),
        "company_id")
    atomic_overwrite(dim_rows, os.path.join(wh, "companies"))
    atomic_overwrite(charges, os.path.join(wh, "charges"))
    write_history_csv(critical, os.path.join(wh, "critical_csv"))

    # query the view off the warehouse (reference readme.md:148-162)
    companies = spark.read.parquet(os.path.join(wh, "companies"))
    fact = spark.read.parquet(os.path.join(wh, "charges"))
    assert companies.count() == 3            # 3 distinct PKs survive
    assert fact.count() == 9_986

    view = daily_company_totals(fact, companies)
    rows = view.collect()
    # grand total across the view == total amount of clean charges
    view_total = sum(Decimal(str(r["total_amount"])) for r in rows)
    clean_total = clean.agg(
        F.sum(F.col("amount").cast("decimal(18,2)"))).collect()[0][0]
    assert view_total == clean_total
    # date-filter pattern returns a subset
    one_day = view.filter(F.col("transaction_date") == "2019-03-16").collect()
    assert 0 < len(one_day) <= 3

    # critical history CSV roundtrip (B1)
    back = (spark.read.option("header", True)
            .csv(os.path.join(wh, "critical_csv")))
    assert back.count() == 14
    assert "_critical_reason" in back.columns
