"""Golden replication: run the full cleaning pipeline on the reference's
own input CSV and assert the published counts and value-level equality
with its committed outputs (reference readme.md:124-130, df_clean.csv,
df_critical.csv)."""

import csv
import math
import os

import pytest

from python_etl_rest_api_spark.operators.clean import build_dim_fact, clean_pipeline
from python_etl_rest_api_spark.sources import read_charges_csv

REF = "/root/reference"
CSV = os.path.join(REF, "data_prueba_técnica.csv")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CSV), reason="reference CSV not present")


@pytest.fixture(scope="module")
def tiers(spark):
    raw = read_charges_csv(spark, CSV).cache()
    clean, critical = clean_pipeline(raw)
    return raw, clean.cache(), critical.cache()


def test_golden_counts(tiers):
    raw, clean, critical = tiers
    assert raw.count() == 10_000
    assert clean.count() == 9_986
    assert critical.count() == 14


def test_critical_reason_breakdown(tiers):
    # reference readme.md:127 / df_critical.csv: missing_company_id 4,
    # invalid_amount 4, missing_id 3, missing_created_at 3
    _, _, critical = tiers
    counts = {r["_critical_reason"]: r["n"] for r in
              critical.groupBy("_critical_reason").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts == {"missing_company_id": 4, "invalid_amount": 4,
                      "missing_id": 3, "missing_created_at": 3}


def test_dim_fact_cardinalities(tiers):
    # reference readme.md:128-129: 5 company rows attempted, 9,986 charges
    _, clean, _ = tiers
    companies, charges = build_dim_fact(clean)
    assert companies.count() == 5
    assert companies.select("company_id").distinct().count() == 3
    assert charges.count() == 9_986


def _load_golden(path):
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def _norm_ts(s):
    # golden CSV renders timestamps as '2019-03-19' or '2019-03-19 00:00:00'
    if not s:
        return None
    return s[:10] if s.endswith(" 00:00:00") else s[:10]


def test_clean_matches_golden_file(tiers):
    _, clean, _ = tiers
    golden = _load_golden(os.path.join(REF, "df_clean.csv"))
    got = {r["id"]: r for r in clean.collect()}
    assert len(got) == len(golden) == 9_986
    for g in golden:
        r = got[g["id"]]
        assert r["company_name"] == g["company_name"], g["id"]
        assert r["company_id"] == g["company_id"], g["id"]
        assert math.isclose(float(r["amount"]), float(g["amount"]),
                            rel_tol=0, abs_tol=1e-9), g["id"]
        assert r["status"] == g["status"], g["id"]
        assert r["created_at"].strftime("%Y-%m-%d") == _norm_ts(g["created_at"]), g["id"]
        g_upd = _norm_ts(g["updated_at"])
        r_upd = r["updated_at"].strftime("%Y-%m-%d") if r["updated_at"] else None
        assert r_upd == g_upd, g["id"]


def test_critical_matches_golden_file(tiers):
    _, _, critical = tiers
    golden = _load_golden(os.path.join(REF, "df_critical.csv"))
    rows = critical.collect()
    assert len(rows) == len(golden) == 14
    # keys may be null; compare as multisets of (id, company_id, reason)
    got = sorted((r["id"] or "", r["company_id"] or "", r["_critical_reason"])
                 for r in rows)
    exp = sorted((g["id"], g["company_id"], g["_critical_reason"])
                 for g in golden)
    assert got == exp
