"""Versioned table directories: atomic publish for concurrent readers.

Directory-overwrite sinks (compaction, the streaming rollup) have a
window where a concurrent reader sees a half-written table.  The
classic fix — what table formats build on — is indirection: data is
immutable under ``<root>/v=<n>/``, and committing is a single atomic
filesystem primitive.  Here the commit is an empty marker file
``_commit_v<n>``: its *existence* is the commit (no content to
half-write, no rename-over-existing races), and the live version is
simply the highest committed ``n``.  Readers resolve marker → data
directory, so they see either the old or the new snapshot, never a
mix; a crash before the marker leaves the old version live and the
orphan directory invisible until :func:`vacuum` sweeps it.

This is deliberately a marker protocol, not a transaction log:
single-writer publish + snapshot reads, which is exactly what the
engine's batch-refresh and foreachBatch sinks need; multi-writer
commit arbitration is a catalog/table-format concern, out of scope by
design (README "by-design exclusions").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MARK = "_commit_v"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _versions(spark: SparkSession, root: str,
              committed_only: bool = True) -> list[int]:
    fs, jvm = _fs(spark, root)
    rootp = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(rootp):
        return []
    committed, dirs = set(), set()
    for st in fs.listStatus(rootp):
        name = st.getPath().getName()
        if name.startswith(_MARK):
            committed.add(int(name[len(_MARK):]))
        elif st.isDirectory() and name.startswith("v="):
            dirs.add(int(name[2:]))
    # committed_only=False is the "every number ever used" view (publish
    # numbering, vacuum sweep): the UNION, not just dirs — a stale
    # marker whose directory is gone (vacuum crashed between dir and
    # marker delete) must never be re-used by a future publish, or that
    # publish would appear committed the instant its directory turns
    # visible, before the data is fully written
    return sorted(committed & dirs if committed_only else committed | dirs)


def current_version(spark: SparkSession, root: str) -> int | None:
    """Highest committed version, or None if never published."""
    vs = _versions(spark, root.rstrip("/"))
    return vs[-1] if vs else None


def publish_version(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next version, then commit it atomically by
    creating the empty marker file."""
    spark = df.sparkSession
    root = root.rstrip("/")
    all_vs = _versions(spark, root, committed_only=False)
    nxt = (all_vs[-1] + 1) if all_vs else 1
    df.write.mode("overwrite").parquet(f"{root}/v={nxt}")

    fs, jvm = _fs(spark, root)
    marker = jvm.org.apache.hadoop.fs.Path(f"{root}/{_MARK}{nxt}")
    fs.create(marker, True).close()      # empty: existence IS the commit
    return nxt


def read_current(spark: SparkSession, root: str) -> DataFrame:
    """Snapshot read of the live version (raises if never published)."""
    cur = current_version(spark, root)
    if cur is None:
        raise FileNotFoundError(f"{root}: no committed version")
    return spark.read.parquet(f"{root.rstrip('/')}/v={cur}")


def read_version(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Time-travel read: snapshot of a specific committed version.

    Only COMMITTED versions are readable — an orphan ``v=<n>``
    directory from a crashed publish is invisible here exactly as it
    is to :func:`read_current`.  Combined with
    :func:`..operators.cdc.snapshot_diff` this gives "what changed
    between v3 and v7" without either snapshot being the live one.
    """
    root = root.rstrip("/")
    if version not in _versions(spark, root):
        raise FileNotFoundError(f"{root}: version {version} not committed "
                                f"(have {_versions(spark, root)})")
    return spark.read.parquet(f"{root}/v={version}")


def version_history(spark: SparkSession, root: str) -> list[int]:
    """All committed versions, oldest first (time-travel catalog)."""
    return _versions(spark, root.rstrip("/"))


def vacuum(spark: SparkSession, root: str, keep: int = 2) -> list[int]:
    """Remove versions older than the newest ``keep`` committed ones,
    plus any uncommitted orphan directories below them; never touches
    the live version.  Returns the versions removed."""
    root = root.rstrip("/")
    fs, jvm = _fs(spark, root)
    committed = _versions(spark, root)
    live = committed[-1] if committed else None
    keep_set = set(committed[-keep:]) if keep > 0 else set()
    victims = [v for v in _versions(spark, root, committed_only=False)
               if v not in keep_set and v != live]
    for v in victims:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v={v}"), True)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{_MARK}{v}"), False)
    return victims
