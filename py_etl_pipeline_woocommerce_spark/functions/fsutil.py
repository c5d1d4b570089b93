"""Warehouse-filesystem helpers via the JVM Hadoop client.

Store existence probes and applied-batch replay markers must live on
the WAREHOUSE filesystem, not the driver's local disk: with an
hdfs:// or s3a:// store, driver-local ``os.path`` calls silently
report "absent" — an existence probe then treats every merge as a
first write (destroying prior partitions on overwrite), and a replay
marker written locally is invisible to a driver restarted on another
host, re-opening the exact double-count the marker exists to close.
``org.apache.hadoop.fs.FileSystem`` resolves file:/hdfs:/s3a: alike
(bare paths fall back to the local filesystem, so local-mode tests
behave identically).
"""

from __future__ import annotations


def hadoop_fs(spark, uri: str):
    """(FileSystem, Path) for a URI — the scheme picks the client."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_exists(spark, uri: str) -> bool:
    fs, p = hadoop_fs(spark, uri)
    return fs.exists(p)


def fs_touch(spark, uri: str) -> None:
    """Create an empty file (parents auto-created, overwrite OK)."""
    fs, p = hadoop_fs(spark, uri)
    fs.create(p, True).close()


def fs_delete(spark, uri: str) -> None:
    """Recursive delete; a no-op when the path is absent."""
    fs, p = hadoop_fs(spark, uri)
    fs.delete(p, True)
