"""Driver-side filesystem maintenance through the Hadoop FileSystem API.

Index and snapshot maintenance (listing generations, publishing a
staging directory, expiring old generations) must work wherever the
data lives — ``file://``, ``hdfs://``, ``s3a://`` — so every operation
here resolves the path's own FileSystem from the active session's
Hadoop configuration.  ``pathlib``/``shutil``/``glob`` are POSIX-only
and silently assume the index root is driver-visible, which breaks the
moment a 100 TB ingest keeps its band index on object storage.

Semantics worth knowing at the call sites:

- ``rename`` is the atomic-publish primitive on HDFS and a fast
  server-side copy+delete on S3A; it FAILS (returns false) onto an
  existing destination, so publishers must pick fresh names rather
  than overwrite.
- ``delete`` is recursive and idempotent (False for a missing path).
- Underscore/dot-prefixed children are Spark-invisible (the parquet
  reader ignores them), which is what makes a ``_staging`` directory a
  safe invisible build area on any of these filesystems.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) bound to the scheme of ``path``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False if the path did not exist."""
    fs, p = _fs(spark, path)
    return bool(fs.delete(p, True))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Publish ``src`` at ``dst`` (same filesystem).  Raises on failure
    — in particular when ``dst`` already exists, because a rename that
    silently no-ops would break the publish-then-expire protocol the
    compaction path relies on."""
    fs, s = _fs(spark, src)
    if not fs.rename(s, jpath(spark, dst)):
        raise IOError(f"rename failed: {src} -> {dst}")


def list_dirs(spark: SparkSession, root: str, hidden: bool = False) -> list[str]:
    """Sorted NAMES of child directories; Spark-invisible names
    (``_``/``.`` prefixed) excluded unless ``hidden``."""
    fs, p = _fs(spark, root)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and (hidden or not name.startswith(("_", "."))):
            out.append(name)
    return sorted(out)


def glob(spark: SparkSession, pattern: str) -> list[str]:
    """Sorted full path strings matching a Hadoop glob pattern."""
    fs, p = _fs(spark, pattern)
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return sorted(st.getPath().toString() for st in statuses)
