"""Concurrency contract of the opcache janitor (r9 verdict item 4 /
r9 ADVICE medium): the cache registry is threading.local, so a thread
starting a new catalog entry (or an operator releasing at its own
start) can never unpersist ANOTHER thread's in-flight cache, and the
REST catalog endpoint's per-request drain only touches the caches the
request itself registered."""

import threading

from pyspark.sql import functions as F

from python_etl_rest_api_spark import opcache
from python_etl_rest_api_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_release_all_is_thread_scoped(spark):
    """A release_all() on thread B must leave thread A's registered
    cache resident (and A's own release must still drain it)."""
    df = spark.range(100).select(F.col("id").alias("k"))
    opcache.cache(df)
    df.count()  # materialize into the cache
    assert df.storageLevel.useMemory

    def other_thread_release():
        # registers nothing on this thread, then drains ITS registry
        opcache.release_all()

    t = threading.Thread(target=other_thread_release)
    t.start()
    t.join()
    # B's drain ran; A's cache must survive
    assert df.storageLevel.useMemory

    opcache.release_all()  # A drains its own
    assert not df.storageLevel.useMemory


def test_interleaved_entries_keep_foreign_caches(spark):
    """Two threads interleaving DIFFERENT caching catalog entries: the
    entry-boundary janitor fires per-thread, so thread A's operator
    cache (registered mid-entry) stays resident while thread B enters
    and leaves a different entry. Uses a barrier so B's entry START
    (the release point) lands strictly between A's cache registration
    and A's use of it."""
    a_cached = spark.range(50).select(F.col("id").alias("v"))
    errs = []
    b_may_start = threading.Event()
    b_done = threading.Event()

    def thread_a():
        try:
            # simulate an in-flight operator: register + materialize
            opcache.cache(a_cached)
            a_cached.count()
            assert a_cached.storageLevel.useMemory
            b_may_start.set()
            assert b_done.wait(120), "thread B never finished"
            # B ran a full (different) caching entry meanwhile; A's
            # in-flight cache must still be resident
            assert a_cached.storageLevel.useMemory, \
                "thread B's entry boundary drained thread A's cache"
            opcache.release_all()
        except BaseException as e:  # noqa: BLE001 - surface to main thread
            errs.append(e)
            b_may_start.set()

    def thread_b():
        try:
            assert b_may_start.wait(120)
            # a real caching entry (minhash LSH registers 2 caches) via
            # the WRAPPED registry - the janitor path under test
            QUERIES["dedup_minhash_lsh"](spark, SF_DIR).count()
            # drain b's own caches so the test leaves nothing resident
            opcache.release_all()
        except BaseException as e:  # noqa: BLE001
            errs.append(e)
        finally:
            b_done.set()

    ta = threading.Thread(target=thread_a)
    tb = threading.Thread(target=thread_b)
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    assert not errs, errs
    assert not a_cached.storageLevel.useMemory  # A's own drain worked
