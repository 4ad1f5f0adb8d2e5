"""Insert-ignore / upsert / atomic-write semantics (SURVEY.md section 2.B)."""

import os

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators import load as load_mod
from python_etl_rest_api_spark.operators.load import (
    atomic_overwrite,
    insert_ignore,
    upsert,
)


@pytest.fixture(autouse=True)
def _no_prune_grace(monkeypatch):
    """These tests write sequentially and assert IMMEDIATE retention
    behavior; the commit-age prune grace (which exists for racing
    concurrent writers — see tests/test_load_soak.py) would defer every
    prune past the test's lifetime. Zero it here."""
    monkeypatch.setattr(load_mod, "_PRUNE_GRACE_SECS", 0.0)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v string, _row_id long")


def test_insert_ignore_first_seen_wins(spark):
    batch = _df(spark, [("a", "v1", 1), ("a", "v2", 2), ("b", "v3", 3)])
    out = insert_ignore(None, batch, "k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "v1", "b": "v3"}


def test_insert_ignore_existing_keys_kept(spark):
    existing = spark.createDataFrame([("a", "old")], "k string, v string")
    batch = _df(spark, [("a", "new", 1), ("c", "v9", 2)])
    out = insert_ignore(existing, batch, "k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "old", "c": "v9"}


def test_upsert_last_writer_wins(spark):
    existing = spark.createDataFrame([("a", "old"), ("b", "keep")],
                                     "k string, v string")
    batch = _df(spark, [("a", "mid", 1), ("a", "new", 2), ("c", "ins", 3)])
    out = upsert(existing, batch, "k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "new", "b": "keep", "c": "ins"}


def test_upsert_idempotent_rerun(spark):
    existing = spark.createDataFrame([("a", "x")], "k string, v string")
    batch = _df(spark, [("a", "y", 1)])
    once = upsert(existing, batch, "k")
    twice = upsert(once, batch, "k")
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


def test_atomic_overwrite_swap(spark, tmp_path):
    path = str(tmp_path / "tbl")
    atomic_overwrite(spark.createDataFrame([(1,)], "x int"), path)
    assert spark.read.parquet(path).count() == 1
    atomic_overwrite(spark.createDataFrame([(1,), (2,)], "x int"), path)
    assert spark.read.parquet(path).count() == 2
    assert not os.path.exists(path + ".old")
    # FK check helper sanity: overwritten table readable via plain scan
    assert spark.read.parquet(path).agg(F.max("x")).collect()[0][0] == 2


def test_atomic_overwrite_symlink_flip(spark, tmp_path):
    """The table path is a symlink after the first write; rewrites flip it
    atomically and keep current + previous versions only."""
    path = str(tmp_path / "linked")
    for n in range(1, 5):
        atomic_overwrite(
            spark.createDataFrame([(i,) for i in range(n)], "x int"), path)
        assert os.path.islink(path)
        assert spark.read.parquet(path).count() == n
    kept = sorted(os.listdir(path + ".versions"))
    assert len(kept) == 2          # current + previous, older pruned


def test_atomic_overwrite_migrates_legacy_dir(spark, tmp_path):
    """A pre-existing real-directory table converts to the symlink layout
    on the next write (one-time migration path)."""
    path = str(tmp_path / "legacy")
    spark.createDataFrame([(1,)], "x int").write.parquet(path)
    assert not os.path.islink(path)
    atomic_overwrite(spark.createDataFrame([(1,), (2,)], "x int"), path)
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == 2
    assert not os.path.exists(path + ".old")


def test_write_jdbc_option_plumbing(spark, monkeypatch):
    """No MySQL in the sandbox: assert the JDBC passthrough forwards url /
    table / mode / batchsize / extra properties to the DataFrame writer."""
    from python_etl_rest_api_spark.operators.load import write_jdbc

    captured = {}

    class FakeWriter:
        def format(self, f):
            captured["format"] = f
            return self

        def option(self, k, v):
            captured.setdefault("options", {})[k] = v
            return self

        def mode(self, m):
            captured["mode"] = m
            return self

        def save(self):
            captured["saved"] = True

    df = spark.createDataFrame([(1,)], "x int")
    monkeypatch.setattr(type(df), "write",
                        property(lambda self: FakeWriter()))
    write_jdbc(df, "jdbc:mysql://h/db", "companies", mode="overwrite",
               properties={"user": "u", "password": "p"}, batchsize=500)
    assert captured["format"] == "jdbc"
    assert captured["mode"] == "overwrite"
    assert captured["saved"]
    assert captured["options"] == {
        "url": "jdbc:mysql://h/db", "dbtable": "companies",
        "batchsize": "500", "user": "u", "password": "p"}


def test_version_claims_never_collide_under_concurrency(spark, tmp_path):
    """Round-6 verdict directive #5: concurrent writers must serialize on
    version ALLOCATION (atomic mkdir claim), so racing overwrites can
    never write into the same v{N}. Drive 8 concurrent atomic_overwrite
    calls and prove: all committed versions are distinct, the symlink
    always points at a committed version, and the final table is one
    writer's batch in full (last-flip-wins, never a blend)."""
    import threading

    from python_etl_rest_api_spark.operators.load import list_versions

    path = str(tmp_path / "tbl")
    batches = {i: [(i * 100 + j,) for j in range(5)] for i in range(8)}
    errs = []

    def write(i):
        try:
            atomic_overwrite(
                spark.createDataFrame(batches[i], "x int"), path, keep=10)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=write, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    vs = list_versions(path)
    assert len(vs) == 8 and len(set(vs)) == 8  # distinct slots, all committed
    rows = sorted(r.x for r in spark.read.parquet(path).collect())
    assert rows in [sorted(x for (x,) in batches[i]) for i in range(8)]


def test_time_travel_and_retention(spark, tmp_path):
    """read_version reads any retained committed version (Delta
    versionAsOf analogue); pruning keeps the newest ``keep``."""
    import pytest

    from python_etl_rest_api_spark.operators.load import (
        list_versions,
        read_version,
    )

    path = str(tmp_path / "tbl")
    for n in (1, 2, 3):
        atomic_overwrite(
            spark.createDataFrame([(i,) for i in range(n)], "x int"),
            path, keep=2)
    assert list_versions(path) == [1, 2]      # v0 pruned by the 3rd write
    assert read_version(spark, path, 1).count() == 2
    assert read_version(spark, path, 2).count() == 3
    with pytest.raises(FileNotFoundError, match="not retained"):
        read_version(spark, path, 0)
    # current link == newest version
    assert spark.read.parquet(path).count() == 3


def test_prune_never_removes_live_symlink_target(spark, tmp_path):
    """Advice r7: a slower writer can flip an OLDER version into place
    after newer ones committed; a subsequent prune must then retain the
    symlink's live target even though it is outside the newest ``keep``,
    else ``path`` dangles for readers. Drive _prune_versions directly in
    the post-race state: link -> v0, keep=1."""
    import os

    from python_etl_rest_api_spark.operators.load import (
        _prune_versions,
        list_versions,
    )

    path = str(tmp_path / "tbl")
    for n in (1, 2, 3):
        atomic_overwrite(
            spark.createDataFrame([(i,) for i in range(n)], "x int"),
            path, keep=10)
    versions = path + ".versions"
    assert list_versions(path) == [0, 1, 2]
    # a losing writer's late flip: the link points at the OLDEST version
    tmp = path + ".relink"
    os.symlink(os.path.join(versions, "v0"), tmp)
    os.rename(tmp, path)
    _prune_versions(path, versions, keep=1)
    # v0 is live -> retained; v1 is neither live nor newest -> pruned
    assert list_versions(path) == [0, 2]
    assert spark.read.parquet(path).count() == 1   # readers still fine


def test_stale_uncommitted_claims_are_reaped(spark, tmp_path):
    """A crashed writer's claim dir (mkdir'd, no _SUCCESS) must not leak
    its CONTENTS forever: claims older than _STALE_CLAIM_SECS have
    their tree cleared on the next write and become tombstones; fresh
    claims are left for their writer."""
    import os
    import time

    from python_etl_rest_api_spark.operators import load as L

    path = str(tmp_path / "tbl")
    atomic_overwrite(spark.createDataFrame([(1,)], "x int"), path)
    versions = path + ".versions"
    stale = os.path.join(versions, "v90")
    fresh = os.path.join(versions, "v91")
    os.mkdir(stale)
    os.mkdir(fresh)
    # a crashed writer left partial output in its claim
    os.makedirs(os.path.join(stale, "_temporary", "0"))
    with open(os.path.join(stale, "part-00000.parquet"), "w") as f:
        f.write("x" * 100)
    old = time.time() - L._STALE_CLAIM_SECS - 60
    for root, dirs, files in os.walk(stale):
        for n in [""] + files:
            os.utime(os.path.join(root, n), (old, old))
    atomic_overwrite(spark.createDataFrame([(2,)], "x int"), path)
    # contents reclaimed, but the dir stays as a tombstone so the slot
    # number is never re-issued to a new writer
    assert os.path.exists(stale)
    assert sorted(os.listdir(stale)) == [L._REAPED_MARKER]
    assert os.path.exists(fresh)          # live claim untouched
    # fresh claim neither cleared nor tombstoned (created empty; a
    # .reaped marker appearing here would mean the reaper judged a
    # LIVE claim stale)
    assert os.listdir(fresh) == []


def test_reaped_slot_is_never_reissued(spark, tmp_path):
    """The r8-advice hazard: reaping used to rmtree the claim dir, so
    _claim_version's max(existing)+1 could hand the SAME v{N} to a new
    writer while the reaped-but-alive zombie resumed appending into it
    (two writers mixing part files in one committed version). With the
    tombstone, the slot stays occupied forever."""
    import os

    from python_etl_rest_api_spark.operators import load as L

    versions = str(tmp_path / "tbl.versions")
    os.makedirs(versions)
    n0, t0 = L._claim_version(versions)
    # simulate: writer of v{n0} goes zombie, reap tombstones it
    with open(os.path.join(t0, L._REAPED_MARKER), "w"):
        pass
    n1, _ = L._claim_version(versions)
    assert n1 == n0 + 1                   # slot n0 not re-issued
    # a second reap pass must skip the tombstone (no mtime churn loop)
    L._reap_stale_claims(versions)
    assert os.path.exists(t0)
    assert os.listdir(t0) == [L._REAPED_MARKER]
