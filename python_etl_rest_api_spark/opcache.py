"""Per-thread registry for operator-internal DataFrame caches.

Several operators cache an intermediate that feeds multiple join sides
(minhash shingle/band tables, simhash sketches, containment postings,
the corrupt-CSV parse). Long-lived sessions — the 315-entry oracle
sweep, the bench loop, a REST service — would otherwise accumulate
every invocation's cache until storage eviction, and the LINGERING
memory pressure taxes every later query (measured at the 100x bench
point: dedup_minhash_lsh 12.7 s solo vs 15.1 s in-suite with prior
entries' caches resident).

The registry is ``threading.local``: a cache registered on thread A is
invisible to ``release_all()`` on thread B, so concurrent callers (the
REST API serves catalog entries from a FastAPI threadpool) can never
unpersist each other's in-flight caches — each thread's hygiene is its
own. Single-threaded sweep/bench/driver sessions see exactly the old
behavior (one thread, one registry).

Two release points, both safe because unpersist never breaks lineage
(a stale lazy frame recomputes instead of crashing):

- each caching operator releases the registry at ITS OWN start
  (per-invocation hygiene, protects non-catalog callers);
- the catalog ``query`` decorator releases it whenever a DIFFERENT
  entry starts (entry-boundary hygiene for sweep/bench sessions) —
  consecutive invocations of the SAME entry keep their cache, which is
  what the bench warm-up relies on;
- the REST catalog endpoint drains in a ``finally`` after its page
  collects (per-request hygiene — threadpool threads are long-lived
  and reused, so without it each request would leak one resident
  cache into the pool thread).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCAL = threading.local()


def _cached() -> list[DataFrame]:
    lst = getattr(_LOCAL, "cached", None)
    if lst is None:
        lst = _LOCAL.cached = []
    return lst


def cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it (on THIS thread's registry) for the
    next release point."""
    _cached().append(df)
    return df.cache()


def release_all() -> None:
    """Unpersist every cache registered on the CALLING thread
    (idempotent, exception-safe — a cache whose session already stopped
    just drops from the list). Other threads' registries are untouched."""
    lst = _cached()
    while lst:
        try:
            lst.pop().unpersist()
        except Exception:
            pass
