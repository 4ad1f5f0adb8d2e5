"""Session-wide registry for operator-internal DataFrame caches.

Several operators cache an intermediate that feeds multiple join sides
(minhash shingle/band tables, simhash sketches, containment postings,
the corrupt-CSV parse). Long-lived sessions — the 315-entry oracle
sweep, the bench loop, a REST service — would otherwise accumulate
every invocation's cache until storage eviction, and the LINGERING
memory pressure taxes every later query (measured at the 100x bench
point: dedup_minhash_lsh 12.7 s solo vs 15.1 s in-suite with prior
entries' caches resident).

Two release points, both safe because unpersist never breaks lineage
(a stale lazy frame recomputes instead of crashing):

- each caching operator releases the registry at ITS OWN start
  (per-invocation hygiene, protects non-catalog callers);
- the catalog ``query`` decorator releases it whenever a DIFFERENT
  entry starts (entry-boundary hygiene for sweep/bench sessions) —
  consecutive invocations of the SAME entry keep their cache, which is
  what the bench warm-up relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: list[DataFrame] = []


def cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for the next release point."""
    _CACHED.append(df)
    return df.cache()


def release_all() -> None:
    """Unpersist every registered cache (idempotent, exception-safe —
    a cache whose session already stopped just drops from the list)."""
    while _CACHED:
        try:
            _CACHED.pop().unpersist()
        except Exception:
            pass
