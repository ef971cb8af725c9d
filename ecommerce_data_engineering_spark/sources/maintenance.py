"""Table maintenance: small-file compaction.

Long-running ingestion (streaming foreachBatch, frequent incremental
upserts) accretes many small parquet files; at cluster scale the
symptom is scan tasks dominated by open/footer overhead and NameNode /
object-store listing pressure.  Standard cure: periodically rewrite a
table (or partition) into ~target-sized files.

Uses the Hadoop FileSystem API via the JVM gateway so the same code
runs on local paths, HDFS, or s3a:// — sizes come from the filesystem,
not a guess.  The rewrite goes to a sibling directory then swaps via
rename: not atomic for concurrent readers (same caveat as the
streaming rollup sink); pair with a catalog/view flip where readers
must never see a partial table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total content size of a table directory (recursive)."""
    fs, hpath = _fs_and_path(spark, path)
    return fs.getContentSummary(hpath).getLength()


def data_file_count(spark: SparkSession, path: str) -> int:
    """Number of parquet data files under ``path`` (recursive)."""
    fs, hpath = _fs_and_path(spark, path)
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n += 1
    return n


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = 256 * 1024 * 1024) -> int:
    """Rewrite ``path`` into ``ceil(total/target)`` files; returns the
    new file count.

    ``repartition`` (round-robin, one shuffle) rather than ``coalesce``
    — coalesce(n) narrows the scan itself to n tasks, so a large
    compaction would read with no parallelism; the shuffle costs one
    pass and keeps read parallelism at the cluster's width.

    .. warning::
       The delete-then-rename swap is NOT safe under concurrency: for
       the window between the two calls the table path does not exist
       at all, so a concurrent reader fails with path-not-found (a
       harder failure than reading a partial table), and a crash inside
       the window loses the live path — the data then survives only
       under the ``<path>_compacting`` sibling and must be renamed back
       by hand.  Only use this for tables with an exclusive maintenance
       window; any table with concurrent readers should be versioned
       and compacted with :func:`compact_current`, whose publish is an
       atomic version flip.
    """
    total = table_bytes(spark, path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "_compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    fs, hpath = _fs_and_path(spark, path)
    _, htmp = _fs_and_path(spark, tmp)
    fs.delete(hpath, True)
    fs.rename(htmp, hpath)
    return data_file_count(spark, path)


def compact_current(spark: SparkSession, root: str,
                    target_file_bytes: int = 256 * 1024 * 1024) -> int:
    """Compaction for a versioned table (sources/versioned.py): rewrite
    the live snapshot as a new version and atomically publish it —
    concurrent readers never see the in-place delete/rename window of
    :func:`compact_parquet`.  Returns the published version."""
    from . import versioned as V

    cur = V.current_version(spark, root)
    if cur is None:
        raise FileNotFoundError(f"{root}: no committed version")
    total = table_bytes(spark, f"{root.rstrip('/')}/v={cur}")
    n_files = max(1, math.ceil(total / target_file_bytes))
    ver = V.publish_version(V.read_current(spark, root).repartition(n_files),
                            root)
    V.vacuum(spark, root, keep=2)
    return ver
