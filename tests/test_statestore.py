"""Unit tests for the manifest-committed versioned snapshot store
(topn_spark/streaming/statestore.py): crash-recovery fallbacks,
checkpoint-reset ordering, replayed epochs, GC windows, legacy
flat-layout migration, corrupt-manifest behavior.

Reference parity note: the reference plugin (TopN.java) holds no
cross-batch state — this store backs the engine's own streaming
extensions, so its contract is tested directly here."""

from __future__ import annotations

import os

import pytest

from topn_spark.streaming.statestore import (
    MANIFEST,
    commit_snapshot,
    current_version,
    read_snapshot,
    version_dir_name,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _read_set(spark, store):
    df = read_snapshot(spark, store)
    return None if df is None else {(r.k, r.v) for r in df.collect()}


def _tamper_manifest(store, content):
    """Overwrite the manifest out-of-band (simulating corruption).
    Hadoop's LocalFileSystem keeps a .crc sidecar; drop it so the
    tampered CONTENT — not a checksum mismatch — is what the store
    parser sees."""
    with open(os.path.join(store, MANIFEST), "w") as fh:
        fh.write(content)
    crc = os.path.join(store, f".{MANIFEST}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_empty_store_is_first_batch(spark, tmp_path):
    store = str(tmp_path / "s")
    assert current_version(spark, store) is None
    assert read_snapshot(spark, store) is None


def test_commit_then_read_round_trip(spark, tmp_path):
    store = str(tmp_path / "s")
    v = commit_snapshot(spark, store, _df(spark, [(1, "a")]), epoch=0)
    assert v == version_dir_name(1)
    assert current_version(spark, store) == v
    assert _read_set(spark, store) == {(1, "a")}
    # manifest records the epoch as metadata on line 2
    with open(os.path.join(store, MANIFEST)) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == v
    assert lines[1] == "epoch=0"


def test_sequence_ignores_epoch_checkpoint_reset(spark, tmp_path):
    """Batch ids restart at 0 when a checkpoint is recreated but the
    store kept — the version sequence must still be monotonic, the
    manifest must resolve the NEWEST data, and old versions get GC'd
    (the round-6 layout would have committed v0 below stale v1)."""
    store = str(tmp_path / "s")
    commit_snapshot(spark, store, _df(spark, [(1, "old")]), epoch=0)
    commit_snapshot(spark, store, _df(spark, [(1, "mid")]), epoch=1)
    # checkpoint reset: epoch restarts at 0
    v3 = commit_snapshot(spark, store, _df(spark, [(1, "new")]), epoch=0)
    assert v3 == version_dir_name(3)
    assert current_version(spark, store) == v3
    assert _read_set(spark, store) == {(1, "new")}
    versions = sorted(n for n in os.listdir(store) if n.startswith("v"))
    assert versions == [version_dir_name(2), version_dir_name(3)]


def test_replayed_epoch_never_deletes_published_version(spark, tmp_path):
    """foreachBatch replay (same epoch after a checkpoint rollback)
    commits a FRESH version — the dir the manifest referenced before
    the replay survives untouched for in-flight readers."""
    store = str(tmp_path / "s")
    v1 = commit_snapshot(spark, store, _df(spark, [(1, "a")]), epoch=5)
    mtime = os.path.getmtime(os.path.join(store, v1))
    v2 = commit_snapshot(spark, store, _df(spark, [(1, "a2")]), epoch=5)
    assert v2 != v1
    assert os.path.isdir(os.path.join(store, v1))
    assert os.path.getmtime(os.path.join(store, v1)) == mtime
    assert _read_set(spark, store) == {(1, "a2")}


def test_gc_keep_window(spark, tmp_path):
    store = str(tmp_path / "s")
    for i in range(5):
        commit_snapshot(
            spark, store, _df(spark, [(i, "x")]), epoch=i, keep=2
        )
    versions = sorted(n for n in os.listdir(store) if n.startswith("v"))
    # current + keep=2 predecessors
    assert versions == [version_dir_name(i) for i in (3, 4, 5)]
    assert _read_set(spark, store) == {(4, "x")}


def test_manifest_missing_falls_back_to_highest_version(spark, tmp_path):
    """Crash window: version dir renamed into place but the manifest
    replacement never ran — the highest visible version IS the newest
    committed state."""
    store = str(tmp_path / "s")
    commit_snapshot(spark, store, _df(spark, [(1, "a")]), epoch=0)
    v2 = commit_snapshot(spark, store, _df(spark, [(1, "b")]), epoch=1)
    os.remove(os.path.join(store, MANIFEST))
    assert current_version(spark, store) == v2
    assert _read_set(spark, store) == {(1, "b")}


def test_manifest_pointing_at_missing_dir_falls_back(spark, tmp_path):
    """A manifest naming a vanished dir must not brick the store: fall
    back to the highest complete version (ADVICE r6: the old raise
    contradicted the crash-at-any-point guarantee)."""
    store = str(tmp_path / "s")
    commit_snapshot(spark, store, _df(spark, [(1, "a")]), epoch=0)
    v2 = commit_snapshot(spark, store, _df(spark, [(1, "b")]), epoch=1)
    _tamper_manifest(store, f"{version_dir_name(99)}\n")
    assert current_version(spark, store) == v2
    assert _read_set(spark, store) == {(1, "b")}


def test_corrupt_manifest_content_raises(spark, tmp_path):
    store = str(tmp_path / "s")
    commit_snapshot(spark, store, _df(spark, [(1, "a")]), epoch=0)
    _tamper_manifest(store, "definitely-not-a-version\n")
    with pytest.raises(Exception, match="corrupt manifest"):
        current_version(spark, store)


def test_manifest_missing_dir_and_no_versions_raises(spark, tmp_path):
    store = str(tmp_path / "s")
    os.makedirs(store)
    _tamper_manifest(store, f"{version_dir_name(7)}\n")
    with pytest.raises(Exception, match="missing version"):
        current_version(spark, store)


def test_leftover_staging_swept_on_next_commit(spark, tmp_path):
    """A staging dir stranded by a crash before the publish rename is
    invisible to readers and removed by the next successful commit."""
    store = str(tmp_path / "s")
    commit_snapshot(spark, store, _df(spark, [(1, "a")]), epoch=0)
    stale = os.path.join(store, ".staging_" + version_dir_name(1))
    os.makedirs(stale)
    with open(os.path.join(stale, "part-junk.parquet"), "wb") as fh:
        fh.write(b"\x00")
    assert _read_set(spark, store) == {(1, "a")}  # invisible to reads
    commit_snapshot(spark, store, _df(spark, [(1, "b")]), epoch=1)
    assert not os.path.exists(stale)
    assert [n for n in os.listdir(store) if n.startswith(".staging")] == []


def test_legacy_flat_store_read_and_migrated(spark, tmp_path):
    """A round-5 store (flat parquet in store_dir, no manifest, no
    version dirs) is readable in place — accumulated state is NOT
    discarded as a first batch — and the first versioned commit
    supersedes and sweeps the flat files."""
    store = str(tmp_path / "s")
    _df(spark, [(1, "old"), (2, "keep")]).write.parquet(store)
    assert current_version(spark, store) is None
    assert _read_set(spark, store) == {(1, "old"), (2, "keep")}
    # a writer merges legacy state forward, then commits version 1
    merged = read_snapshot(spark, store).where("k = 2").union(
        _df(spark, [(3, "new")])
    )
    v = commit_snapshot(spark, store, merged, epoch=0)
    assert v == version_dir_name(1)
    assert _read_set(spark, store) == {(2, "keep"), (3, "new")}
    # flat data files are gone; only store structures remain
    flat = [
        n
        for n in os.listdir(store)
        if os.path.isfile(os.path.join(store, n))
        and not n.startswith(("_", "."))
    ]
    assert flat == []


def test_cdc_batch_resumes_from_legacy_store(spark, tmp_path):
    """End-to-end ADVICE r6 case: cdc_batch over a legacy flat
    snapshot must classify against the accumulated state (key 1 is
    'changed', not re-'added') and migrate the store."""
    from topn_spark.streaming.ingest import cdc_batch, read_cdc_snapshot

    snap = str(tmp_path / "snap")
    chg = str(tmp_path / "chg")
    _df(spark, [(1, "a"), (2, "b")]).write.parquet(snap)
    cdc_batch(
        _df(spark, [(1, "A2"), (3, "c")]), snap, chg, ["k"], ["v"],
        batch_id=0,
    )
    statuses = {
        (r.k, r.status) for r in spark.read.parquet(chg).collect()
    }
    assert statuses == {(1, "changed"), (3, "added")}
    got = {(r.k, r.v) for r in read_cdc_snapshot(spark, snap).collect()}
    assert got == {(1, "A2"), (2, "b"), (3, "c")}
