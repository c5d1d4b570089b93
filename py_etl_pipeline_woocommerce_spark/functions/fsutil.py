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


def fs_mkdirs(spark, uri: str) -> None:
    """Create a directory (and parents); a no-op when present."""
    fs, p = hadoop_fs(spark, uri)
    fs.mkdirs(p)


def fs_rename(spark, src: str, dst: str) -> bool:
    """Hadoop ``rename`` — atomic within one directory on HDFS and
    the local filesystem (the staged-commit promotion primitive).
    On S3A, rename is a non-atomic copy+delete: the staged-commit
    stores remain replay-CORRECT there (recovery re-promotes what is
    still staged) but a reader can observe a partially-copied object
    listing mid-rename; a transactional table format (Delta/Iceberg)
    is the production fix for S3 readers. The destination's parent is
    created first (Hadoop rename fails, rather than creates, missing
    parents). Returns the filesystem's success boolean."""
    fs, src_p = hadoop_fs(spark, src)
    # the parent probe/create must run on the DESTINATION's
    # filesystem — with a cross-filesystem pair (file:/ staging,
    # s3a:// table) the source FS would throw Wrong-FS or create a
    # bogus local directory instead of the real parent
    dst_fs, dst_p = hadoop_fs(spark, dst)
    parent = dst_p.getParent()
    if parent is not None and not dst_fs.exists(parent):
        dst_fs.mkdirs(parent)
    return fs.rename(src_p, dst_p)


def fs_list_names(spark, uri: str) -> list[str]:
    """Child entry NAMES of a directory ([] when absent)."""
    fs, p = hadoop_fs(spark, uri)
    if not fs.exists(p):
        return []
    return [s.getPath().getName() for s in fs.listStatus(p)]


def promote_staged(
    spark,
    staged_dir: str,
    dst_dir: str,
    name_prefix: str,
) -> None:
    """Shared staged-commit promotion: move every child of
    ``staged_dir`` whose name starts with ``name_prefix`` into
    ``dst_dir`` (delete-target-then-rename), then drop the staging
    directory. ONE implementation for both replay-safe stores so
    their crash-window behavior cannot diverge.

    Idempotent under replay: an entry already promoted no longer
    exists under staging and is skipped, so a crash mid-promotion is
    completed by the next call. The target is deleted BEFORE each
    rename — on S3A (copy+delete rename) a crash between the copy and
    the source delete leaves the entry at BOTH paths, and a bare
    rename would then return false forever, wedging replay; deleting
    the stale target first makes the re-rename succeed. A no-op when
    the staging directory is absent (fully promoted earlier).
    """
    if not fs_exists(spark, staged_dir):
        return
    dst = dst_dir.rstrip("/")
    fs_mkdirs(spark, dst)
    for name in fs_list_names(spark, staged_dir):
        if not name.startswith(name_prefix):
            continue
        fs_delete(spark, f"{dst}/{name}")
        if not fs_rename(spark, f"{staged_dir}/{name}", f"{dst}/{name}"):
            raise RuntimeError(
                f"staged-commit promotion failed renaming {name} into "
                f"{dst} — staging left intact for replay"
            )
    fs_delete(spark, staged_dir)
