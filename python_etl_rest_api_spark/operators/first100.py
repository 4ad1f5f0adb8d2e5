"""The First100 set engine (reference api/first100.py, api/main.py).

The reference keeps a mutable in-process set of 1..100 with extract /
missing / reset operations and fails under multiple workers (its own
documented flaw, SURVEY.md L7). Here state lives in an APPEND-ONLY
parquet store re-read inside every operation, so concurrent workers
converge on the same state:

- each extraction appends one (n, token) row - no worker ever overwrites
  another's writes;
- duplicate extraction is adjudicated by a read-AFTER-write check: both
  racing writers land their rows, then both re-read and the smaller
  token wins; the loser raises the same "already extracted" error a
  sequential duplicate would (round-1 advice: the previous
  load-once/overwrite design served stale state and clobbered writes);
- reset() truncates by overwriting with an empty frame (last writer
  wins - the reference's reset has the same semantics).

'remaining' stays a declarative anti-join over ``spark.range`` - set
semantics, no driver-side loops.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STORE_SCHEMA = "n long, token string"

# The store pattern below RE-READS AND COLLECTS the whole table inside
# every operation. That is valid ONLY because state is bounded at <= n
# rows by construction (extractions of a set 1..n); the recipe must not
# be cloned for an unbounded keyspace, where _read_store() becomes a
# driver-side full-table collect. The constructor enforces the bound.
MAX_N = 10_000


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
        if not 1 <= n <= MAX_N:
            raise ValidationError(
                f"n must be in [1, {MAX_N}]: the collect-per-operation "
                "state store is only valid while state is <= n rows "
                "(see module docstring); larger keyspaces need a "
                "shuffled store, not this recipe")
        self.spark = spark
        self.n = n
        self.store_path = store_path
        self._extracted: list[int] = []
        if store_path:
            self._load()

    # -- state store ------------------------------------------------------
    def _read_store(self) -> list[tuple[int, str]]:
        """All (n, token) rows currently in the store ([] when absent).
        Legacy token-less rows read as token='' (sorts first, keeps the
        original extraction as the winner)."""
        try:
            df = self.spark.read.parquet(self.store_path)
        except Exception:
            return []
        if "token" not in df.columns:
            df = df.withColumn("token", F.lit(""))
        return [(r["n"], r["token"] or "") for r in df.collect()]

    def _load(self) -> None:
        """Refresh the in-process view from the shared store. Called at the
        top of every operation so multi-worker deployments never serve
        stale state (each worker sees every other worker's appends)."""
        if not self.store_path:
            return
        self._extracted = sorted({n for n, _ in self._read_store()})

    def _append(self, number: int, token: str) -> None:
        df = self.spark.createDataFrame([(number, token)], _STORE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.store_path)

    def _truncate(self) -> None:
        df = self.spark.createDataFrame([], _STORE_SCHEMA)
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
        self._load()
        if number in self._extracted:
            raise ValidationError(f"{number} was already extracted")
        if self.store_path:
            # append-only write, then read-after-write adjudication: if a
            # concurrent worker also appended this number, the smaller
            # token wins and the other call reports the duplicate.
            token = f"{time.time_ns():020d}-{os.getpid()}"
            self._append(number, token)
            claims = sorted(t for n_, t in self._read_store() if n_ == number)
            self._load()
            if claims and claims[0] != token:
                raise ValidationError(f"{number} was already extracted")
        else:
            self._extracted.append(number)
        return {"extracted": number,
                "remaining_count": self.n - len(self._extracted)}

    def missing(self) -> int:
        """Gauss-sum missing number (reference api/first100.py:40-48):
        requires exactly one extraction."""
        self._load()
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
        self._load()
        rows = (self.spark.range(1, self.n + 1).withColumnRenamed("id", "n")
                .join(self.remaining_df(), "n", "left_anti")
                .collect())
        return sorted(r["n"] for r in rows)

    def reset(self) -> dict:
        self._extracted = []
        if self.store_path:
            self._truncate()
        return {"status": "reset", "remaining_count": self.n}
