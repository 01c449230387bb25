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


def tree_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes under ``path`` (recursive listing — namenode
    metadata, no I/O); 0 for a missing path.  The cheap size probe
    guards use before deciding to broadcast a frame read from disk."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def artifact_root(spark: SparkSession, kind: str, corpus_key: str) -> str:
    """Default root for persisted model artifacts (IVF index, BPE merge
    table) when the caller gives no explicit path.

    Three properties the demo/bench call sites need:

    - **Session-scheme-qualified.**  The base is the session's
      ``spark.sql.warehouse.dir`` (itself resolved against
      ``fs.defaultFS``), so on a cluster the artifacts land next to the
      warehouse — hdfs/s3a — not on a driver-local ``/tmp`` that the
      executors reading the partitioned assignments cannot see.
    - **Process-private.**  The path is salted with uid+pid: a
      world-shared ``/tmp`` directory keyed only by the corpus hash
      lets concurrent runs overwrite each other's parquet mid-read, and
      lets another user on a multi-user host pre-create or replace the
      artifact.  Within one process the path is STABLE, so bench
      warmup+timed runs reuse (overwrite) one directory instead of
      leaking a fresh mkdtemp copy per invocation.
    - **Corpus-keyed.**  Distinct corpora get distinct roots so two
      sf_dirs never clobber each other's artifacts in one process.

    Production deployments pass an explicit durable ``path`` — this
    default exists for self-contained runs.  Because every new process
    salts a fresh ``u<uid>_p<pid>`` tree, creation also best-effort
    VACUUMS stale sibling trees left by this user's dead processes
    (ADVICE r7: nothing else ever reclaimed them, so repeated
    bench/demo runs accumulated parquet under the warehouse
    indefinitely).  The ``os.kill(pid, 0)`` liveness probe is only
    meaningful for pids on THIS host, so the vacuum runs ONLY when the
    warehouse resolves to a local ``file:`` scheme — on a shared
    hdfs://s3a:// warehouse a pid from another gateway host (or pid
    namespace) that happens to be dead locally may be a LIVE driver
    elsewhere, and deleting its tree would yank a serving index out
    from under it (r8 review finding).  Shared-warehouse trees are a
    documented operator-cleanup path instead."""
    import hashlib
    import os

    base = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).rstrip("/")
    uid = os.getuid() if hasattr(os, "getuid") else 0
    if _is_local_scheme(base):
        _vacuum_dead_artifact_roots(spark, f"{base}/_dbdiff_artifacts", uid)
    key = hashlib.md5(corpus_key.encode()).hexdigest()[:12]
    return f"{base}/_dbdiff_artifacts/u{uid}_p{os.getpid()}/{kind}_{key}"


def _is_local_scheme(path: str) -> bool:
    """True when ``path`` resolves to this host's filesystem (bare path
    or ``file:`` scheme) — the only place a local pid-liveness probe is
    a valid ownership signal."""
    head = path.split("/", 1)[0]
    return ":" not in head or head.split(":", 1)[0] == "file"


# minimum idle time before a dead-pid artifact tree is reaped: long
# enough that a live remote owner on a shared mount would have written
# again (bench/demo runs write every few seconds), short enough that
# leaked trees still reclaim within a working session
_VACUUM_MIN_IDLE_S = 3600


def _vacuum_dead_artifact_roots(
    spark: SparkSession, artifacts_root: str, uid: int
) -> list[str]:
    """Delete ``u<uid>_p<pid>`` sibling trees whose pid no longer runs
    on this host (same uid only — other users' pids can't be probed
    reliably, and their trees aren't ours to reap) AND whose tree has
    been idle past ``_VACUUM_MIN_IDLE_S``.  The age guard covers the
    case the scheme gate cannot see: a local ``file:`` path that is
    actually a SHARED POSIX mount (NFS, bind mount across pid
    namespaces), where a foreign host's pid can look dead here while
    its driver is live there — a live writer's tree has a recent
    mtime, so requiring both signals keeps the reap safe without
    giving up reclamation (r8 review finding).  Best-effort by
    contract: any filesystem or probe error leaves the tree in place.
    Returns the deleted child names (for the test)."""
    import os
    import time

    def _tree_mtime(path: str, max_depth: int = 12) -> float:
        # newest mtime over a bounded recursive walk: artifact writes
        # land 2+ levels deep (ivf_index_<key>/cells/cell=*/part-*),
        # and POSIX dir mtime only moves on DIRECT entry changes — a
        # live owner appending files under an existing subdirectory
        # never refreshes a depth-1 entry, so a depth-1 scan could
        # reap a live tree (r8 ADVICE finding).  The cap must clear
        # Spark's commit-staging nesting — an in-flight partitioned
        # write lands at relative depth 7-8
        # (kind/assignments/_temporary/0/_temporary/attempt_*/cell=*/
        # part-*), so 6 would miss a live deep write (r9 ADVICE);
        # 12 bounds pathological trees while covering staging.  Stat
        # dirnames BEFORE pruning at the cap, so the deepest level
        # still contributes its own mtime.
        mt = os.path.getmtime(path)
        base_depth = path.rstrip("/").count("/")
        try:
            for dirpath, dirnames, filenames in os.walk(path):
                for entry in dirnames + filenames:
                    try:
                        mt = max(
                            mt, os.path.getmtime(os.path.join(dirpath, entry))
                        )
                    except OSError:
                        continue
                if dirpath.count("/") - base_depth >= max_depth:
                    dirnames[:] = []
        except OSError:
            pass
        return mt

    reaped: list[str] = []
    me = os.getpid()
    local_root = artifacts_root.split(":", 1)[1] if artifacts_root.startswith(
        "file:"
    ) else artifacts_root
    try:
        for name in list_dirs(spark, artifacts_root):
            if not name.startswith(f"u{uid}_p"):
                continue
            try:
                pid = int(name.rsplit("_p", 1)[1])
            except ValueError:
                continue
            if pid == me:
                continue
            try:
                os.kill(pid, 0)  # raises if no such pid
                continue  # alive: leave it
            except ProcessLookupError:
                pass  # dead: reap below
            except Exception:
                continue  # permission/odd state: do not touch
            try:
                idle = time.time() - _tree_mtime(f"{local_root}/{name}")
            except OSError:
                continue
            if idle < _VACUUM_MIN_IDLE_S:
                continue  # recently written: possibly a live remote owner
            if delete(spark, f"{artifacts_root}/{name}"):
                reaped.append(name)
    except Exception:
        pass  # vacuum must never sink the artifact write itself
    return reaped
