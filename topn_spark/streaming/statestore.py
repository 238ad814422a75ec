"""Manifest-committed versioned snapshot store for foreachBatch state.

The round-5 snapshot rewrite swapped directories in place
(delete ``final``, rename ``tmp`` -> ``final``), which left two holes:
a crash between the delete and the rename strands the state under a
tmp name the reader never looks at, and a concurrent reader that
resolves ``final`` inside the window sees no directory at all and
mistakes accumulated state for a first batch.

This module removes both by never mutating a published directory:

* every snapshot version is written to its own immutable dir
  ``store/v<seq>`` (staged under a dot-prefixed name, then renamed
  into place — directory rename is atomic on HDFS and local posix);
* the version SEQUENCE is derived inside the store as
  ``max(existing) + 1`` — it deliberately does NOT trust the caller's
  streaming ``batch_id``/epoch, because batch ids restart at 0 when a
  user recreates the checkpoint but keeps the store; an epoch-keyed
  layout would then commit a new v0 below surviving stale versions,
  and any highest-version fallback would resurrect pre-reset state.
  The epoch is recorded as manifest metadata only;
* a manifest file ``store/_MANIFEST`` names the current version; it
  is replaced by write-tmp + rename, so readers either see the old
  pointer or the new one, never a torn file;
* a published version dir is NEVER deleted while the manifest may
  point at it — commit always targets a fresh sequence number, and GC
  keeps the ``keep`` most recent versions below the current one, so a
  crash at any point leaves a complete, readable snapshot;
* readers resolve through the manifest. If the manifest is missing,
  or names a version whose dir is gone (both only reachable through a
  crash window on a filesystem without atomic overwrite-rename), the
  reader falls back to the HIGHEST complete version dir — correct
  because a version dir only becomes visible after it is fully
  written, and sequences are monotonic across checkpoint resets. A
  manifest whose CONTENT is unparseable is different: that is not a
  known crash window, so the store raises instead of guessing.

A pre-versioning ("legacy") store — flat parquet data files directly
in ``store_dir`` with no manifest and no version dirs — is still
readable: :func:`read_snapshot` detects the layout and reads the flat
files, and the first :func:`commit_snapshot` supersedes them (the
flat files are garbage-collected after the first versioned commit
lands, same timing as old-version GC).

Older versions are garbage-collected after commit, keeping ``keep``
previous versions so in-flight readers of the last snapshot finish
before their input disappears. This is the same contract a table
format (Delta/Iceberg) provides for the full data; state here is
small (digests, signatures, keyed snapshots) so a hand-rolled
manifest is proportionate.

Reference parity note: the reference plugin (TopN.java) holds no
cross-batch state; this store backs the engine's OWN streaming
extensions (cdc_batch and friends in streaming/ingest.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"
_VDIR_RE = re.compile(r"^v(\d{10})$")


def _hadoop(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop API —
    path-scheme agnostic (file://, hdfs://, s3a://...)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def version_dir_name(seq: int) -> str:
    if seq < 0:
        raise ValueError(f"version sequence must be >= 0, got {seq}")
    return f"v{seq:010d}"


def _list_versions(spark: SparkSession, store_dir: str) -> list[str]:
    """Visible (fully-committed) version dir names, ascending."""
    fs, root = _hadoop(spark, store_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and _VDIR_RE.match(name):
            out.append(name)
    return sorted(out)


def _legacy_data_files(spark: SparkSession, store_dir: str) -> list:
    """Root-level regular data files from a pre-versioning flat store
    (parquet part files live directly in ``store_dir``). Metadata
    names (``_SUCCESS``, ``_MANIFEST``, dot-files) are excluded."""
    fs, root = _hadoop(spark, store_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append(st.getPath())
    return out


def current_version(spark: SparkSession, store_dir: str) -> str | None:
    """Resolve the current snapshot version dir name, or ``None`` when
    the store holds no committed version (first batch, or a legacy
    flat-layout store — see :func:`read_snapshot`).

    Resolution order: the manifest pointer; if the manifest is absent
    or names a version whose dir is missing (crash windows on
    filesystems without atomic overwrite-rename), the highest visible
    version dir. An unparseable manifest raises — that is corruption,
    not a known crash window.
    """
    fs, _ = _hadoop(spark, store_dir)
    mpath = _jpath(spark, f"{store_dir.rstrip('/')}/{MANIFEST}")
    versions = _list_versions(spark, store_dir)
    if fs.exists(mpath):
        stream = fs.open(mpath)
        try:
            raw = bytes(
                stream.readAllBytes()
                if hasattr(stream, "readAllBytes")
                else _read_stream(stream)
            )
        finally:
            stream.close()
        name = raw.decode("utf-8").splitlines()[0].strip() if raw else ""
        if not _VDIR_RE.match(name):
            raise IOError(
                f"corrupt manifest in {store_dir}: {name!r} is not a "
                f"version dir name"
            )
        if fs.exists(_jpath(spark, f"{store_dir.rstrip('/')}/{name}")):
            return name
        # The manifest can name a missing dir only through a crash
        # between the GC-less commit steps on a filesystem where the
        # manifest rename was not atomic; every visible version dir is
        # complete and sequences are monotonic, so the highest one is
        # the newest committed state — recover instead of bricking.
        if versions:
            return versions[-1]
        raise IOError(
            f"manifest in {store_dir} points at missing version "
            f"{name} and no version dirs exist — store is corrupt"
        )
    return versions[-1] if versions else None


def _read_stream(stream) -> bytes:
    # FSDataInputStream without readAllBytes: drain in chunks via the
    # single-byte java read() — manifests are ~30 bytes, cost is nil.
    buf = bytearray()
    while True:
        b = stream.read()
        if b < 0:
            break
        buf.append(b)
    return bytes(buf)


def read_snapshot(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Current committed snapshot as a DataFrame, or ``None`` when no
    snapshot has ever been committed (legitimate first batch).

    A legacy flat-layout store (data files in ``store_dir`` itself,
    no versions, no manifest) is read in place — accumulated round-5
    state is never silently discarded."""
    ver = current_version(spark, store_dir)
    if ver is not None:
        return spark.read.parquet(f"{store_dir.rstrip('/')}/{ver}")
    if _legacy_data_files(spark, store_dir):
        return spark.read.parquet(store_dir)
    return None


def commit_snapshot(
    spark: SparkSession,
    store_dir: str,
    df: DataFrame,
    epoch: int = 0,
    keep: int = 1,
) -> str:
    """Write ``df`` as a NEW version and advance the manifest.

    The version sequence is ``max(existing) + 1`` — monotonic even
    when the caller's streaming ``epoch``/batch_id restarts at 0 after
    a checkpoint reset; the epoch is recorded in the manifest as
    metadata only. A replayed epoch (foreachBatch re-run after a
    checkpoint rollback) therefore commits a fresh version with the
    recomputed content — the previously published dir, which the
    manifest may still reference and concurrent readers may hold open,
    is never deleted or overwritten.

    Steps (each leaves the store readable if the next never runs):

    1. write the data under ``.staging_v<seq>`` — invisible to
       :func:`_list_versions` and the manifest;
    2. atomically rename the staging dir to ``v<seq>`` — the
       version becomes visible and complete in one operation;
    3. replace the manifest (write ``_MANIFEST.tmp`` + rename over);
    4. delete versions older than the ``keep`` most recent below the
       new one, stale staging dirs, and (once, on the first versioned
       commit over a legacy store) the superseded flat data files.

    Returns the committed version dir name.
    """
    root = store_dir.rstrip("/")
    fs, _ = _hadoop(spark, root)
    versions = _list_versions(spark, root)
    seq = (int(_VDIR_RE.match(versions[-1]).group(1)) + 1) if versions else 1
    vname = version_dir_name(seq)
    legacy = _legacy_data_files(spark, root)
    staging = f"{root}/.staging_{vname}"
    final = f"{root}/{vname}"
    df.write.mode("overwrite").parquet(staging)
    fpath, spath = _jpath(spark, final), _jpath(spark, staging)
    if fs.exists(fpath):
        # single-writer contract: a fresh sequence can only pre-exist
        # if two writers race on the same store — refuse to clobber
        raise IOError(
            f"version {final} appeared during commit — concurrent "
            f"writer detected; staged snapshot is intact at {staging}"
        )
    if not fs.rename(spath, fpath):
        raise IOError(
            f"rename {staging} -> {final} failed; staged snapshot is "
            f"intact at {staging}"
        )
    _write_manifest(spark, root, vname, epoch)
    _gc_versions(spark, root, vname, keep)
    # the flat legacy files were merged into this version's plan and
    # the staging write has fully materialized it — they are
    # superseded; sweep them so the legacy-read path never shadows
    # (the version dirs win resolution anyway, this is space GC)
    for p in legacy:
        fs.delete(p, False)
    return vname


def _write_manifest(
    spark: SparkSession, root: str, vname: str, epoch: int
) -> None:
    fs, _ = _hadoop(spark, root)
    tmp = _jpath(spark, f"{root}/{MANIFEST}.tmp")
    final = _jpath(spark, f"{root}/{MANIFEST}")
    out = fs.create(tmp, True)
    try:
        # line 1 is the pointer (parsed); line 2 is metadata for
        # humans/debugging (ignored by the parser)
        out.write(bytearray(f"{vname}\nepoch={epoch}\n", "utf-8"))
    finally:
        out.close()
    # posix/HDFS file rename over an existing target is atomic; on
    # filesystems where it is not permitted, delete-then-rename opens
    # a manifest-less window — covered by the max-version fallback in
    # current_version (the new version dir is already visible).
    if not fs.rename(tmp, final):
        fs.delete(final, False)
        if not fs.rename(tmp, final):
            raise IOError(f"could not publish manifest in {root}")


def _gc_versions(
    spark: SparkSession, root: str, current: str, keep: int
) -> None:
    fs, _ = _hadoop(spark, root)
    versions = _list_versions(spark, root)
    # keep-set = the (keep + 1) most recent versions: the current one
    # plus `keep` predecessors for in-flight readers; everything else
    # goes — including any version ABOVE current, which can only exist
    # if an external actor wrote it (current is always the max we just
    # committed), so "not in keep-set" rather than "older than current"
    keep_set = set(versions[-(keep + 1):])
    keep_set.add(current)  # never delete the manifest-referenced dir
    for v in versions:
        if v not in keep_set:
            fs.delete(_jpath(spark, f"{root}/{v}"), True)
    # a staging dir left by a crashed earlier attempt at a lower or
    # equal sequence can never be committed (commit always targets a
    # fresh max+1) — sweep it
    for st in fs.listStatus(_jpath(spark, root)):
        name = st.getPath().getName()
        if name.startswith(".staging_v") and name[len(".staging_"):] <= current:
            fs.delete(st.getPath(), True)
