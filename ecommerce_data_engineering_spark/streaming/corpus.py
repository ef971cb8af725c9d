"""Streaming corpus ingest: the LLM-training data funnel as a
continuous pipeline instead of a batch rebuild.

Micro-batches of documents are exact-deduplicated against EVERYTHING
admitted so far (a versioned content-key registry), quality-gated with
the single-expression Gopher verdict (operators/text.gopher_gate), and
landed in per-epoch output directories.  The composition mirrors the
batch ``corpus_curation_funnel`` stages, so streaming-equals-batch is
testable (tests/test_streaming.py).

Exactly-once shape:
- admitted docs write to ``out_path/epoch=N`` with overwrite — a batch
  retry rewrites its own epoch directory instead of duplicating rows;
- the content-key registry publishes through the versioned-table
  commit marker (sources/versioned.py), so a crash between the two
  leaves the previous registry live and the retried batch re-admits
  the same keys deterministically.

Scale notes: the registry holds one 32-byte key per distinct document
ever seen — compact, but republished per batch here; at 100 TB it
becomes a bucketed keyer table (merge-on-read) or a Bloom-guarded
store, and the per-epoch output directories become date-partitioned
appends.  The per-batch joins are hash joins on the key column only —
document bodies never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.text import gopher_gate
from ..schemas import FIXTURES


def curated_corpus_incremental(spark: SparkSession, src_dir: str,
                               registry_path: str, out_path: str,
                               checkpoint: str,
                               timeout_s: int = 180) -> DataFrame:
    """Drive the documents feed under ``src_dir`` through the
    streaming curation funnel; returns the curated corpus (union of
    all epoch outputs).  One parquet file per micro-batch
    (maxFilesPerTrigger=1) so redelivered/overlapping feed files
    exercise the cross-batch dedup path."""
    docs = (spark.readStream.schema(FIXTURES["documents"])
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir.rstrip("/")))

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        from ..sources import versioned as V

        sess = batch_df.sparkSession
        keyed = batch_df.withColumn(
            "content_key", F.md5(F.lower(F.trim(F.col("text")))))
        # in-batch dedup: deterministic keeper = min doc_id per key
        firsts = (keyed.groupBy("content_key")
                  .agg(F.min("doc_id").alias("doc_id")))
        batch_unique = keyed.join(firsts, ["content_key", "doc_id"])
        if V.current_version(sess, registry_path) is None:
            fresh = batch_unique
            merged_keys = fresh.select("content_key")
        else:
            seen = V.read_current(sess, registry_path)
            fresh = batch_unique.join(seen, "content_key", "left_anti")
            merged_keys = seen.unionByName(
                fresh.select("content_key")).distinct()
        # register BEFORE gating: a rejected document's content stays
        # seen, exactly like the batch funnel (dedup keepers are chosen
        # from the full corpus, the gate filters afterward)
        admitted = fresh.filter(gopher_gate("text")).drop("content_key")
        admitted.write.mode("overwrite").parquet(
            f"{out_path.rstrip('/')}/epoch={epoch_id}")
        V.publish_version(merged_keys, registry_path)
        V.vacuum(sess, registry_path, keep=2)

    q = (docs.writeStream.outputMode("append")
         .foreachBatch(fold)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_s)
    return spark.read.option("basePath", out_path).parquet(
        f"{out_path.rstrip('/')}/epoch=*")
