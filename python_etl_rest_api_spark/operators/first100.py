"""The First100 set engine (reference api/first100.py, api/main.py).

The reference keeps a mutable in-process set of 1..100 with extract /
missing / reset operations and fails under multiple workers (its own
documented flaw, SURVEY.md L7). Here state is a tiny keyed table
(extracted numbers) shared across workers; 'remaining' is a declarative
anti-join over ``spark.range`` - set semantics, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ValidationError(ValueError):
    """Mirrors reference api/first100.py:3-4 (mapped to HTTP 400)."""


class First100:
    """Bounded set 1..n with extraction state in a table-backed store.

    Reference semantics (api/first100.py:6-48, api/main.py:12-39):
    - extract(k): k must be int in [1, n] and not already extracted -> 400
    - missing(): requires EXACTLY ONE extracted number; returns it via the
      Gauss closed form n(n+1)/2 - sum(remaining)
    - reset(): fresh state
    """

    def __init__(self, spark: SparkSession, n: int = 100,
                 store_path: str | None = None):
        self.spark = spark
        self.n = n
        self.store_path = store_path
        self._extracted: list[int] = []
        if store_path:
            self._load()

    # -- state store ------------------------------------------------------
    def _load(self) -> None:
        try:
            rows = self.spark.read.parquet(self.store_path).collect()
            self._extracted = sorted(r["n"] for r in rows)
        except Exception:
            self._extracted = []

    def _persist(self) -> None:
        if not self.store_path:
            return
        df = self.spark.createDataFrame([(k,) for k in self._extracted], "n long")
        df.write.mode("overwrite").parquet(self.store_path)

    # -- set algebra as DataFrames ---------------------------------------
    def extracted_df(self) -> DataFrame:
        if not self._extracted:
            return self.spark.createDataFrame([], "n long")
        return self.spark.createDataFrame([(k,) for k in self._extracted], "n long")

    def remaining_df(self) -> DataFrame:
        """1..n minus extracted - left-anti join (reference I3 semantics)."""
        full = self.spark.range(1, self.n + 1).withColumnRenamed("id", "n")
        return full.join(self.extracted_df(), "n", "left_anti")

    # -- API operations ----------------------------------------------------
    def extract(self, number) -> dict:
        if not isinstance(number, int) or isinstance(number, bool):
            raise ValidationError("number must be an integer")
        if number < 1 or number > self.n:
            raise ValidationError(f"number must be between 1 and {self.n}")
        if number in self._extracted:
            raise ValidationError(f"{number} was already extracted")
        self._extracted.append(number)
        self._persist()
        return {"extracted": number, "remaining_count": self.n - len(self._extracted)}

    def missing(self) -> int:
        """Gauss-sum missing number (reference api/first100.py:40-48):
        requires exactly one extraction."""
        if len(self._extracted) != 1:
            raise ValidationError(
                "missing() requires exactly one extracted number, "
                f"got {len(self._extracted)}")
        expected = self.n * (self.n + 1) // 2
        remaining_sum = (self.remaining_df()
                         .agg(F.sum("n").alias("s")).collect()[0]["s"]) or 0
        return expected - remaining_sum

    def missing_via_set(self) -> list[int]:
        """Alternate impl (reference api/first100.py:31-38): direct set
        difference, no cardinality precondition - kept as a cross-check."""
        rows = (self.spark.range(1, self.n + 1).withColumnRenamed("id", "n")
                .join(self.remaining_df(), "n", "left_anti")
                .collect())
        return sorted(r["n"] for r in rows)

    def reset(self) -> dict:
        self._extracted = []
        self._persist()
        return {"status": "reset", "remaining_count": self.n}
