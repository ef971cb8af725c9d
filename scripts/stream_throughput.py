"""Measured Structured-Streaming throughput (round 6).

tests/test_streaming.py pins the semantics (stream≡batch, watermark
eviction, exactly-once publish, 50-batch soak); this measures the RATE:
drive a large events corpus through the watermarked hourly rollup in
time-ordered micro-batches and record sustained rows/sec, state-store
growth, and the streamed-vs-batch equality on the same input.

    python scripts/make_scaled_fixture.py /tmp/sf_64x 64
    python scripts/stream_throughput.py /tmp/sf_64x 32

Method: the fixture's events table is range-split by event time into N
parquet files (a monotone file feed — the arrival pattern a watermark
is designed for), streamed with maxFilesPerTrigger=1 + availableNow
into an update-mode memory sink, and the query's own progress metrics
provide per-batch input rows and durations.  The streamed aggregate
must equal the batch twin bit-for-bit (same exact-decimal sum +
portable rounding), or the script exits 1 and writes no record.

Writes STREAM_BENCH.json at the repo root; SCALE.md quotes it and
scripts/check_scale_evidence.py asserts the citation stays fresh.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--force"]
    src_dir = args[0] if args else "/tmp/sf_64x"
    n_files = int(args[1]) if len(args) > 1 else 32
    feed = f"/tmp/stream_feed_{os.path.basename(src_dir.rstrip('/'))}"

    from pyspark.sql import SparkSession, functions as F

    from ecommerce_data_engineering_spark.functions.rounding import (
        dsum, pround)
    from ecommerce_data_engineering_spark.sources import load
    from ecommerce_data_engineering_spark.streaming.events import (
        run_stream_to_memory)
    from ecommerce_data_engineering_spark.streaming.source import (
        stream_events_dir)

    spark = (SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    events = load(spark, src_dir, "events")
    n_rows = events.count()

    # Range-split by event time into a monotone file feed: file k holds
    # the k-th time slice, so each micro-batch advances the watermark
    # and earlier windows finalize + evict — the steady-state regime,
    # not one giant batch.  repartitionByRange gives contiguous slices
    # (part-0000k = the k-th ts range).  FileStreamSource orders the
    # backlog by MODIFICATION TIME, not name — small files all copied
    # within one mtime tick would stream in arbitrary order, turning
    # the monotone feed non-monotone and (correctly) dropping late rows
    # — so stamp each file with an explicit, strictly increasing mtime.
    import shutil
    if os.path.exists(feed):
        shutil.rmtree(feed)
    stage = feed + "_stage"
    (events.repartitionByRange(n_files, "ts")
     .write.mode("overwrite").parquet(stage))
    os.makedirs(feed)
    parts = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    base = time.time() - 2 * len(parts)
    for k, f in enumerate(parts):
        dst = os.path.join(feed, f)
        shutil.copy(os.path.join(stage, f), dst)
        os.utime(dst, (base + 2 * k, base + 2 * k))
    shutil.rmtree(stage)

    stream = (stream_events_dir(spark, feed, max_files_per_trigger=1)
              .withWatermark("ts", "1 hour")
              .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   pround(dsum(F.col("value"), scale=4), 2)
                   .alias("total_value"))
              .select(F.col("win.start").alias("window_start"),
                      "event_type", "n_events", "total_value"))

    t0 = time.time()
    streamed, progress = run_stream_to_memory(
        stream, "tput_test", timeout_s=1800, return_progress=True)
    wall = time.time() - t0

    # update-mode memory sink holds ONE ROW PER EMISSION: a window fed
    # by several micro-batches appears once per batch with its running
    # aggregate.  n_events strictly increases with each update (a
    # window is only re-emitted when it received rows), so the final
    # state of each key is its max-n_events row.
    streamed = (streamed.groupBy("window_start", "event_type")
                .agg(F.max_by(F.struct("n_events", "total_value"),
                              "n_events").alias("fin"))
                .select("window_start", "event_type",
                        F.col("fin.n_events").alias("n_events"),
                        F.col("fin.total_value").alias("total_value")))

    batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    input_rows = sum(p["numInputRows"] for p in batches)
    busy_ms = sum(p["durationMs"].get("triggerExecution", 0)
                  for p in batches)
    state = [p["stateOperators"][0] for p in progress
             if p.get("stateOperators")]
    removed = sum(s.get("numRowsRemoved", 0) for s in state)
    peak = max(s["numRowsTotal"] for s in state)
    final = state[-1]["numRowsTotal"]

    batch_df = (events
                .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     pround(dsum(F.col("value"), scale=4), 2)
                     .alias("total_value"))
                .select(F.col("win.start").alias("window_start"),
                        "event_type", "n_events", "total_value"))
    s = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch_df.collect()}
    matches = s == b

    rec = {
        "fixture": src_dir, "rows": n_rows, "files": n_files,
        "micro_batches": len(batches), "wall_s": round(wall, 1),
        "busy_trigger_s": round(busy_ms / 1000, 1),
        "rows_per_sec_wall": int(n_rows / wall),
        "rows_per_sec_busy": int(input_rows / (busy_ms / 1000)),
        "state_rows_peak": peak, "state_rows_final": final,
        "state_rows_removed": removed,
        "streamed_equals_batch": matches,
    }
    print(json.dumps(rec, indent=1))
    if not matches:
        sys.exit("STREAMED RESULT != BATCH — no record written")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rec_path = os.path.join(here, "STREAM_BENCH.json")
    # same clobber guard as scale_correctness.py (ADVICE r5): a
    # spot-check from a smaller fixture must not silently replace the
    # authoritative record made from a different one
    if os.path.exists(rec_path) and "--force" not in sys.argv:
        prev = json.load(open(rec_path))
        if prev.get("fixture") != src_dir:
            sys.exit(f"REFUSING to overwrite STREAM_BENCH.json (records "
                     f"fixture {prev.get('fixture')!r}, this run used "
                     f"{src_dir!r}); pass --force to replace it")
    with open(rec_path, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote STREAM_BENCH.json")


if __name__ == "__main__":
    main()
