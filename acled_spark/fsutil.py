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


def fs_list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Names of the VISIBLE data files directly under ``path`` — the
    same inventory Spark's readers consume (hidden ``_``/``.`` names
    such as _SUCCESS, _manifest.json, and .crc sidecars excluded)."""
    fs, jpath, _ = _fs_and_path(spark, path)
    names = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            names.append(name)
    return sorted(names)
