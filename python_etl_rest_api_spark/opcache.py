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
in a global map (the list held strongly, the owner Thread by weakref
— liveness probe only), and both ``cache()`` and ``release_all()``
opportunistically drain registries whose owner thread is no longer
alive or whose Thread object has been collected — a LIVE thread's caches are never touched by another thread,
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

# id(thread) -> (weakref to the owner Thread, that thread's registry
# list). Guarded by _REG_LOCK. The registry list is held STRONGLY and
# the Thread only by weakref: holding the Thread itself weakly (the
# pre-r12 WeakKeyDictionary form) meant a Thread object collected
# before any cache()/release_all() ran took its registry entry with it,
# and that thread's persisted frames stranded until storage eviction —
# the backstop missed exactly the unreferenced-thread case (ADVICE
# r11). An entry is removed only AFTER its list is drained, so a
# collected Thread still gets its caches reaped. id() reuse cannot
# alias a live registry: _register() drains any stale entry (dead or
# collected owner) before overwriting the slot.
_REGISTRIES: dict[int, tuple["weakref.ref[threading.Thread]", list]] = {}
_REG_LOCK = threading.Lock()


def _register(lst: list) -> None:
    t = threading.current_thread()
    with _REG_LOCK:
        stale = _REGISTRIES.get(id(t))
        _REGISTRIES[id(t)] = (weakref.ref(t), lst)
    if stale is not None and stale[1] is not lst:
        _drain(stale[1])


def _cached() -> list[DataFrame]:
    lst = getattr(_LOCAL, "cached", None)
    if lst is None:
        lst = _LOCAL.cached = []
        _register(lst)
    return lst


def _drain(lst: list) -> None:
    while lst:
        try:
            lst.pop().unpersist()
        except Exception:
            pass


def _reap_dead_threads() -> None:
    """Unpersist caches stranded by threads that exited (or whose
    Thread object was collected) without a release point. Only such
    threads' registries are touched — the owner cannot race us — and
    each entry is dropped only after its list is drained."""
    with _REG_LOCK:
        dead = [(key, lst) for key, (ref, lst) in _REGISTRIES.items()
                if (t := ref()) is None or not t.is_alive()]
    for key, lst in dead:
        _drain(lst)
        with _REG_LOCK:
            # re-check under the lock: id() reuse may have re-bound the
            # slot to a new live thread while we drained
            cur = _REGISTRIES.get(key)
            if cur is not None and cur[1] is lst:
                del _REGISTRIES[key]


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
    untouched; registries stranded by DEAD threads are reaped.

    A thread that never cached anything allocates nothing here: going
    through _cached() would insert an empty registry slot for every
    transient caller thread (reaped only after the thread dies), so the
    no-op path reads the thread-local directly (ADVICE r12)."""
    lst = getattr(_LOCAL, "cached", None)
    if lst is not None:
        _drain(lst)
    _reap_dead_threads()
