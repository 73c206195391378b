"""Small Hadoop-filesystem helpers shared by the sidecar writers.

Driver-side text IO against ANY Hadoop-supported scheme (file://, hdfs,
s3a, ...) for tiny artifacts that live NEXT TO datasets but are not
datasets themselves — model metadata sidecars (ml/persist.py), export
manifests (export.py).  py4j passes arrays by value, so a
read-into-buffer loop can't work from Python; commons-io (on Spark's
classpath) drains streams JVM-side in one call.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, jpath, _ = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(text.encode("utf-8"))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path: str) -> str:
    fs, jpath, jvm = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _fs_and_path(spark, path)
    return fs.exists(jpath)


def fs_replace_dir(spark: SparkSession, src: str, dest: str) -> None:
    """Replace ``dest`` with the fully-written ``src`` (delete + rename).

    Not atomic — Hadoop FS has no directory swap — but ``src`` is
    complete before ``dest`` is touched, so a crash inside the window
    loses nothing: ``dest`` is gone but ``src`` still holds the full
    payload and a restart can promote it (see
    :meth:`acled_spark.drift.DriftMonitor._recover_staging`).  A plain
    ``mode("overwrite")`` write has the opposite failure shape: the old
    data is deleted before the new data exists.
    """
    fs, jdest, jvm = _fs_and_path(spark, dest)
    jsrc = jvm.org.apache.hadoop.fs.Path(src)
    if fs.exists(jdest) and not fs.delete(jdest, True):
        raise IOError(f"could not delete {dest}")
    if not fs.rename(jsrc, jdest):
        raise IOError(f"could not rename {src} -> {dest}")


def fs_try_promote_dir(spark: SparkSession, src: str, dest: str) -> bool:
    """Rename ``src`` into ``dest`` ONLY when ``dest`` is absent.

    The reader-safe half of :func:`fs_replace_dir`: it never deletes an
    existing ``dest``, so a concurrent writer mid-swap cannot lose a
    live table to a healing reader (ADVICE r6, dedup_store committed
    window).  Peer-tolerant: ``src`` vanishing or ``dest`` appearing
    between the checks and the rename means another process completed
    the same promotion — that is success-by-proxy, not an error.
    Returns True iff THIS call performed the rename.
    """
    fs, jdest, jvm = _fs_and_path(spark, dest)
    jsrc = jvm.org.apache.hadoop.fs.Path(src)
    if fs.exists(jdest) or not fs.exists(jsrc):
        return False
    if fs.rename(jsrc, jdest):
        return True
    if fs.exists(jdest):
        return False  # a peer promoted it between our check and rename
    raise IOError(f"could not rename {src} -> {dest}")


def fs_list_dirs(spark: SparkSession, path: str) -> list[str]:
    """Names of the immediate SUBDIRECTORIES of ``path`` (sorted) —
    including ``_``/``.``-prefixed ones, which Spark's readers hide but
    our own maintenance code (epoch-fold GC in ann.py) must see.
    Missing ``path`` is an empty listing, not an error."""
    fs, jpath, _ = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if st.isDirectory()
    )


def fs_delete_dir(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` if it exists (idempotent)."""
    fs, jpath, _ = _fs_and_path(spark, path)
    if fs.exists(jpath) and not fs.delete(jpath, True):
        raise IOError(f"could not delete {path}")


def fs_qualified_path(spark: SparkSession, path: str) -> str:
    """The filesystem-resolved absolute (decoded) path of ``path`` —
    the prefix against which file URIs relativize."""
    fs, jpath, _ = _fs_and_path(spark, path)
    return fs.makeQualified(jpath).toUri().getPath()


def fs_list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Root-relative paths of the VISIBLE data files under ``path`` —
    the same inventory Spark's readers consume (hidden ``_``/``.``
    components such as _SUCCESS, _manifest.json, and .crc sidecars
    excluded at every level).  Recursive, so partitioned layouts
    (``lang=en/part-*.parquet``) are inventoried file-by-file; for a
    flat export the relative path IS the basename."""
    fs, jpath, _ = _fs_and_path(spark, path)
    root = fs.makeQualified(jpath).toUri().getPath().rstrip("/")
    names = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        p = it.next().getPath().toUri().getPath()
        rel = p[len(root) + 1 :] if p.startswith(root + "/") else p.rsplit("/", 1)[-1]
        if any(part.startswith(("_", ".")) for part in rel.split("/")):
            continue
        names.append(rel)
    return sorted(names)
