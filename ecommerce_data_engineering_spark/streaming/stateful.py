"""Custom stateful streaming operator: running per-key totals via
``applyInPandasWithState`` (SURVEY.md §2.11 extension surface).

This is the pattern for operators Structured Streaming lacks natively
(running counters, custom sessionization, CDC folding): state lives in
the state store per key, each micro-batch's Arrow batches fold into
it, and the operator emits the updated aggregate.  At firehose scale
the state is partitioned by key across executors; eviction is the
caller's policy (timeouts) — bounded state is what lets it run
forever.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from .source import events_stream

OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("running_events", T.LongType()),
    T.StructField("running_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _fold_totals(key: Tuple[str], pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({
        "event_type": [key[0]],
        "running_events": [n],
        "running_value": [round(total, 2)],
    })


def stream_running_totals(spark: SparkSession, sf_dir: str,
                          src: DataFrame | None = None) -> DataFrame:
    """Streaming running (event-count, value-sum) per event_type.

    ``src`` overrides the fixture-directory source (see
    joins.stream_click_purchase_join — same injection pattern, used by
    the throughput soak to pace micro-batches)."""
    if src is None:
        src = events_stream(spark, sf_dir)
    return (src.groupBy("event_type")
            .applyInPandasWithState(
                _fold_totals, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
