"""bench.py's machine-load context + drift classification (VERDICT r9
#1) are what make a round-over-round bench delta adjudicable from the
artifact alone — so their arithmetic gets unit tests even though the
bench itself only runs under the driver.  No SparkSession needed."""

from __future__ import annotations

import importlib.util
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(HERE, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_busy_fraction_from_proc_stat_deltas():
    start = {"_stat": (100.0, 1000.0)}
    end = {"_stat": (400.0, 1500.0)}
    # 300 busy of 500 total jiffies over the window
    assert bench._busy_fraction(start, end) == 0.6


def test_busy_fraction_degrades_to_none():
    # missing snapshots (non-Linux /proc) or a non-advancing counter
    # must yield None, never a crash or a bogus 0.0
    assert bench._busy_fraction({}, {"_stat": (1.0, 2.0)}) is None
    assert bench._busy_fraction({"_stat": (1.0, 2.0)}, {}) is None
    assert bench._busy_fraction({"_stat": (5.0, 10.0)},
                                {"_stat": (5.0, 10.0)}) is None


def test_load_snapshot_shape():
    snap = bench._load_snapshot()
    assert snap.get("ncpu") and snap["ncpu"] > 0
    # on this Linux box both samplers must be live
    assert len(snap["loadavg"]) == 3
    busy, total = snap["_stat"]
    assert 0 < busy <= total


def test_proc_stat_counts_iowait_as_idle():
    st = bench._proc_stat()
    assert st is not None
    busy, total = st
    # busy excludes idle+iowait by construction
    assert busy < total
