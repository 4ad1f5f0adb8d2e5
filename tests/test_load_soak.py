"""Multi-PROCESS soak for the atomic_overwrite claim protocol.

The thread-based tests in test_load.py exercise claim races inside one
interpreter; this soak runs the REAL protocol code
(``operators.load._overwrite_protocol`` — the exact claim/flip/prune/reap
path ``atomic_overwrite`` drives, with the Spark write swapped for an
os-level committer so each process doesn't need a JVM) from many
concurrent OS processes hammering ONE table path, while dedicated reader
processes continuously resolve the symlink. Invariants asserted:

- readers NEVER observe the CURRENTLY SERVED version dangling, without
  ``_SUCCESS``, or as a mid-write partial (part files but no marker).
  Reads are link-validated (resolve, list, re-resolve): an observation
  of a version the link moved off mid-read is the protocol's documented
  bounded-staleness case, not a violation — see _reader_proc;
- every committed version's part files come from exactly one writer
  (no slot was ever shared — the mkdir claim + tombstone reap guarantee);
- pre-seeded stale claims (mtime forced > 24 h old) are tombstoned, and
  their slot numbers are never re-issued to a new writer;
- the retained-version count converges to ``keep`` and the final link
  serves a complete commit.

Bounds the residual realpath->rmtree race documented in
_prune_versions with running evidence instead of a comment
(reference etl/03_transform_and_load.py:122,158,164 is the commit/
rollback surface this protocol re-expresses)."""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import pytest

from python_etl_rest_api_spark.operators import load as load_mod


def _commit_like_spark(target: str, wid: int, seq: int) -> None:
    """Populate a claimed version dir the way Spark's FileOutputCommitter
    does: part files first, ``_SUCCESS`` marker last."""
    for p in range(2):
        with open(os.path.join(
                target, f"part-{p:05d}-writer{wid}.parquet"), "w") as f:
            f.write(json.dumps({"writer": wid, "seq": seq, "part": p}))
    with open(os.path.join(target, "_SUCCESS"), "w"):
        pass


def _writer_proc(path: str, wid: int, iters: int, err_q) -> None:
    try:
        for seq in range(iters):
            load_mod._overwrite_protocol(
                lambda target: _commit_like_spark(target, wid, seq),
                path, keep=2)
    except Exception as exc:  # pragma: no cover - failure reporting
        err_q.put(f"writer {wid}: {type(exc).__name__}: {exc}")


def _reader_proc(path: str, stop_path: str, err_q) -> None:
    """Spin on the symlink: the CURRENT version must always be a
    complete commit.

    The read is link-validated: resolve the link, list the resolved
    directory, then re-resolve. If the link moved while we were
    reading, the observation was of a superseded version that a
    concurrent prune may legitimately be deleting — the protocol's
    documented bounded-staleness contract (a reader slower than
    ``keep`` overwrite cycles plus the grace loses its directory; this
    soak shrinks the grace to 0.75 s and overwrites every ~0.5 ms, so
    an ordinary ~2 ms scheduler stall between the reader's opendir and
    readdir crosses that bound — observed as an empty dir mid-rmtree,
    the r14 flake). A GENUINE violation — prune removing the version
    the link still serves — keeps the link in place, so it still
    trips the re-validated checks below."""
    seen = 0
    try:
        while not os.path.exists(stop_path):
            if not os.path.lexists(path):
                continue  # first commit hasn't landed yet
            resolved = os.path.realpath(path)
            try:
                entries = os.listdir(resolved)
            except OSError as exc:
                if os.path.realpath(path) != resolved:
                    continue  # link moved mid-read: superseded version
                err_q.put(f"reader: served dir unreadable: {exc}")
                return
            if "_SUCCESS" not in entries:
                if os.path.realpath(path) != resolved:
                    continue  # link moved mid-read: superseded version
                # The link STILL serves the incomplete dir - a reader
                # could scan a half-written table, the core invariant.
                try:
                    vlist = sorted(os.listdir(path + ".versions"))
                except OSError:
                    vlist = ["<gone>"]
                err_q.put(
                    f"reader: served dir without _SUCCESS: {entries} "
                    f"at {resolved}; versions={vlist}; "
                    f"still_exists={os.path.exists(resolved)}")
                return
            writers = {e.split("writer")[1].split(".")[0]
                       for e in entries if "writer" in e}
            if len(writers) > 1:
                err_q.put(f"reader: mixed-writer version: {entries}")
                return
            seen += 1
    except Exception as exc:  # pragma: no cover
        err_q.put(f"reader crashed: {type(exc).__name__}: {exc}")


def test_multiprocess_overwrite_soak(tmp_path):
    path = str(tmp_path / "table")
    versions = path + ".versions"
    os.makedirs(versions, exist_ok=True)

    # Seed two crashed-writer claims (no _SUCCESS) with trees aged past
    # the 24 h reap threshold: the soak must tombstone them and never
    # re-issue their slots.
    stale_slots = []
    for n in (0, 1):
        vdir = os.path.join(versions, f"v{n}")
        os.mkdir(vdir)
        with open(os.path.join(vdir, "part-00000-crashed.parquet"), "w"):
            pass
        old = time.time() - load_mod._STALE_CLAIM_SECS - 3600
        for root, _dirs, files in os.walk(vdir):
            for name in [""] + files:
                os.utime(os.path.join(root, name), (old, old))
        stale_slots.append(n)

    ctx = mp.get_context("fork")
    err_q = ctx.Queue()
    stop_path = str(tmp_path / "stop")

    # Shrink the prune grace so pruning actually fires inside a short
    # soak (fork children inherit the patched value). The production
    # 60 s default only makes the protected window WIDER.
    orig_grace = load_mod._PRUNE_GRACE_SECS
    load_mod._PRUNE_GRACE_SECS = 0.75

    n_writers, iters = 6, 12
    writers = [ctx.Process(target=_writer_proc,
                           args=(path, wid, iters, err_q))
               for wid in range(n_writers)]
    readers = [ctx.Process(target=_reader_proc,
                           args=(path, stop_path, err_q))
               for _ in range(3)]
    for p in readers + writers:
        p.start()
    for p in writers:
        p.join(timeout=120)
    with open(stop_path, "w"):
        pass
    for p in readers:
        p.join(timeout=30)
    load_mod._PRUNE_GRACE_SECS = orig_grace
    for p in readers + writers:
        assert not p.is_alive(), "soak process hung"
        assert p.exitcode == 0

    errs = []
    while not err_q.empty():
        errs.append(err_q.get())
    assert errs == [], f"soak invariant violations: {errs}"

    # Stale claims were tombstoned, not deleted - slots never re-issued.
    for n in stale_slots:
        vdir = os.path.join(versions, f"v{n}")
        assert os.path.isdir(vdir), "tombstone dir must survive"
        assert os.path.exists(os.path.join(vdir, load_mod._REAPED_MARKER))
        assert not os.path.exists(os.path.join(vdir, "_SUCCESS")), \
            "a reaped slot was re-issued to a new writer"
        assert not any("writer" in e for e in os.listdir(vdir)), \
            "a new writer's part files landed in a tombstoned slot"

    # Final state: the link resolves to a complete single-writer commit,
    # every committed version is single-writer, and after the grace
    # period expires one more prune converges retention to ~keep.
    time.sleep(1.0)
    orig = load_mod._PRUNE_GRACE_SECS
    load_mod._PRUNE_GRACE_SECS = 0.75
    try:
        load_mod._prune_versions(path, versions, keep=2)
    finally:
        load_mod._PRUNE_GRACE_SECS = orig
    committed = load_mod.list_versions(path)
    assert committed, "no committed versions after soak"
    assert len(committed) <= 3  # keep=2 plus at most the live version
    for n in committed:
        entries = os.listdir(os.path.join(versions, f"v{n}"))
        assert "_SUCCESS" in entries
        writers_seen = {e.split("writer")[1].split(".")[0]
                        for e in entries if "writer" in e}
        assert len(writers_seen) == 1, f"v{n} mixed writers: {entries}"
    final = os.listdir(path)
    assert "_SUCCESS" in final
    # The served version must be one of the retained committed versions
    # (a dangling link after prune is the bug class this soak bounds).
    served = os.path.realpath(path)
    assert os.path.basename(served) in {f"v{n}" for n in committed}
