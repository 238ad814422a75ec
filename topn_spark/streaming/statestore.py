"""Manifest-committed versioned snapshot store for foreachBatch state.

The round-5 snapshot rewrite swapped directories in place
(delete ``final``, rename ``tmp`` -> ``final``), which left two holes:
a crash between the delete and the rename strands the state under a
tmp name the reader never looks at, and a concurrent reader that
resolves ``final`` inside the window sees no directory at all and
mistakes accumulated state for a first batch.

This module removes both by never mutating a published directory:

* every snapshot version is written to its own immutable dir
  ``store/v<epoch>`` (staged under a dot-prefixed name, then renamed
  into place — directory rename is atomic on HDFS and local posix);
* a one-line manifest file ``store/_MANIFEST`` names the current
  version; it is replaced by write-tmp + rename, so readers either
  see the old pointer or the new one, never a torn file;
* readers resolve through the manifest. If the manifest is missing
  but version dirs exist (the only crash window: manifest replaced
  non-atomically on a filesystem without overwrite-rename), the
  reader falls back to the HIGHEST complete version dir — which is
  correct because a version dir only becomes visible after it is
  fully written, and the manifest is only advanced after the dir
  exists.

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


def version_dir_name(epoch: int) -> str:
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    return f"v{epoch:010d}"


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


def current_version(spark: SparkSession, store_dir: str) -> str | None:
    """Resolve the current snapshot version dir name, or ``None`` when
    the store holds no committed snapshot yet (the first-batch case).

    Resolution order: the manifest pointer, then (crash-recovery
    fallback) the highest visible version dir.
    """
    fs, _ = _hadoop(spark, store_dir)
    mpath = _jpath(spark, f"{store_dir.rstrip('/')}/{MANIFEST}")
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
        name = raw.decode("utf-8").strip()
        if not _VDIR_RE.match(name):
            raise IOError(
                f"corrupt manifest in {store_dir}: {name!r} is not a "
                f"version dir name"
            )
        if not fs.exists(_jpath(spark, f"{store_dir.rstrip('/')}/{name}")):
            raise IOError(
                f"manifest in {store_dir} points at missing version "
                f"{name} — store is corrupt, refusing to guess"
            )
        return name
    versions = _list_versions(spark, store_dir)
    return versions[-1] if versions else None


def _read_stream(stream) -> bytes:
    # FSDataInputStream without readAllBytes: drain in chunks via the
    # single-byte java read() — manifests are ~12 bytes, cost is nil.
    buf = bytearray()
    while True:
        b = stream.read()
        if b < 0:
            break
        buf.append(b)
    return bytes(buf)


def read_snapshot(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Current committed snapshot as a DataFrame, or ``None`` when no
    version has ever been committed (legitimate first batch)."""
    ver = current_version(spark, store_dir)
    if ver is None:
        return None
    return spark.read.parquet(f"{store_dir.rstrip('/')}/{ver}")


def commit_snapshot(
    spark: SparkSession,
    store_dir: str,
    df: DataFrame,
    epoch: int,
    keep: int = 1,
) -> str:
    """Write ``df`` as version ``epoch`` and advance the manifest.

    Steps (each leaves the store readable if the next never runs):

    1. write the data under ``.staging_v<epoch>`` — invisible to
       :func:`_list_versions` and the manifest;
    2. atomically rename the staging dir to ``v<epoch>`` — the
       version becomes visible and complete in one operation;
    3. replace the manifest (write ``_MANIFEST.tmp`` + rename over);
    4. delete versions older than the ``keep`` most recent below the
       new one.

    Returns the committed version dir name. Re-running the same epoch
    (foreachBatch replay after a checkpoint rollback) overwrites the
    same version dir and re-points the manifest — idempotent.
    """
    root = store_dir.rstrip("/")
    vname = version_dir_name(epoch)
    fs, _ = _hadoop(spark, root)
    staging = f"{root}/.staging_{vname}"
    final = f"{root}/{vname}"
    df.write.mode("overwrite").parquet(staging)
    fpath, spath = _jpath(spark, final), _jpath(spark, staging)
    if fs.exists(fpath):
        # replayed epoch: the dir from the failed attempt is stale
        fs.delete(fpath, True)
    if not fs.rename(spath, fpath):
        raise IOError(
            f"rename {staging} -> {final} failed; staged snapshot is "
            f"intact at {staging}"
        )
    _write_manifest(spark, root, vname)
    _gc_versions(spark, root, vname, keep)
    return vname


def _write_manifest(spark: SparkSession, root: str, vname: str) -> None:
    fs, _ = _hadoop(spark, root)
    tmp = _jpath(spark, f"{root}/{MANIFEST}.tmp")
    final = _jpath(spark, f"{root}/{MANIFEST}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(f"{vname}\n", "utf-8"))
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
    older = [v for v in versions if v < current]
    for v in older[: max(0, len(older) - keep)]:
        fs.delete(_jpath(spark, f"{root}/{v}"), True)
    # a staging dir left by a crashed earlier attempt at a LOWER epoch
    # can never be committed (its epoch is in the past) — sweep it
    for st in fs.listStatus(_jpath(spark, root)):
        name = st.getPath().getName()
        if name.startswith(".staging_v") and name[len(".staging_") :] < current:
            fs.delete(st.getPath(), True)
