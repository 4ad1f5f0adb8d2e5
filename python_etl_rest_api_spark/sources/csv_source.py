"""CSV source with explicit schema + stable row ids (SURVEY.md A1).

The reference reads its dirty payments CSV with pandas type inference
(reference etl/03_transform_and_load.py:26-30). Here the scan uses an
explicit all-string schema (inference = extra full pass + sampling
nondeterminism at scale) and attaches a stable ``_row_id`` so the two
order-dependent semantics downstream (first-valid imputation G1,
first-seen-wins dim load B2) are deterministic and cluster-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CHARGES_RAW_SCHEMA

ROW_ID = "_row_id"


def with_stable_row_id(df: DataFrame) -> DataFrame:
    """Attach a monotonically increasing id whose ORDER is stable and
    deterministic for a given input, and equals file order for
    single-file input.

    ``monotonically_increasing_id`` is (partition_id << 33) + offset: row
    order within a split is preserved, but Spark packs splits sorted by
    SIZE descending, so for MULTI-file input partition ids need not follow
    file-name order - the id order is run-deterministic, not file order.
    The reference's order-dependent semantics (G1 first-valid fill, B2
    first-seen-wins) are defined over ONE CSV, where this is exact. When
    true cross-file order matters, order by
    ``(input_file_name(), _row_id)`` instead. The id is NOT dense - only
    its order is meaningful - and costs zero shuffles (no zipWithIndex).
    """
    return df.withColumn(ROW_ID, F.monotonically_increasing_id())


def read_charges_csv(spark: SparkSession, path: str,
                     row_id: bool = True) -> DataFrame:
    df = (
        spark.read
        .option("header", True)
        # raw values must arrive verbatim for the lenient casts to replicate
        # pandas semantics (empty string vs null, scientific notation, etc.)
        .option("mode", "PERMISSIVE")
        .schema(CHARGES_RAW_SCHEMA)
        .csv(path)
    )
    return with_stable_row_id(df) if row_id else df
