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

Thread-exit hygiene: a worker thread that dies without reaching a
release point would strand its caches (the thread-local registry is
unreachable, but Spark keeps the persisted frames resident until
storage eviction). Every per-thread registry is therefore ALSO tracked
in a global weak map, and both ``cache()`` and ``release_all()``
opportunistically drain registries whose owner thread is no longer
alive — a LIVE thread's caches are never touched by another thread,
preserving the isolation guarantee. Callers spawning short-lived
worker threads should still call ``release_all()`` on the worker
before it exits (prompt release beats eventual reclamation); the
reaper is the backstop, not the contract.

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
import weakref

from pyspark.sql import DataFrame

_LOCAL = threading.local()

# owner-thread weakref -> that thread's registry list. Guarded by
# _REG_LOCK; entries for dead/collected threads are drained by
# _reap_dead_threads(). WeakKeyDictionary keys on the Thread OBJECT
# (not the reusable ident), so a recycled thread id can never alias an
# old registry.
_REGISTRIES: "weakref.WeakKeyDictionary[threading.Thread, list]" = \
    weakref.WeakKeyDictionary()
_REG_LOCK = threading.Lock()


def _cached() -> list[DataFrame]:
    lst = getattr(_LOCAL, "cached", None)
    if lst is None:
        lst = _LOCAL.cached = []
        with _REG_LOCK:
            _REGISTRIES[threading.current_thread()] = lst
    return lst


def _drain(lst: list) -> None:
    while lst:
        try:
            lst.pop().unpersist()
        except Exception:
            pass


def _reap_dead_threads() -> None:
    """Unpersist caches stranded by threads that exited without a
    release point. Only DEAD threads' registries are touched; the
    owner cannot race us (it no longer runs)."""
    with _REG_LOCK:
        dead = [lst for t, lst in _REGISTRIES.items()
                if not t.is_alive() and lst]
    for lst in dead:
        _drain(lst)


def cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it (on THIS thread's registry) for the
    next release point. Also reaps registries stranded by dead
    threads."""
    _reap_dead_threads()
    _cached().append(df)
    return df.cache()


def release_all() -> None:
    """Unpersist every cache registered on the CALLING thread
    (idempotent, exception-safe — a cache whose session already stopped
    just drops from the list). Other LIVE threads' registries are
    untouched; registries stranded by DEAD threads are reaped."""
    _drain(_cached())
    _reap_dead_threads()
