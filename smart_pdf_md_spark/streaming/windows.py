"""Streaming windowed aggregation + custom stateful operator.

The reference has no streaming (SURVEY.md §2.9); these exist because a
KG-construction service at scale ingests repo events continuously. The
shapes are the canonical Structured-Streaming ones:

- tumbling-window counts with a watermark (late rows beyond the watermark
  are dropped by the engine, not by user code);
- per-key running state via ``applyInPandasWithState`` — the custom-stateful
  escape hatch (here: cumulative per-user event count + last-seen timestamp,
  the building block of streaming dedup/session state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def read_event_stream(spark, events_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts; watermark bounds state + late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


_STATE_SCHEMA = "n long, last_ts timestamp"
_OUT_SCHEMA = "user_id long, n_events long, last_ts timestamp"


def _update_user_state(key, pdfs, state: GroupState):
    import pandas as pd

    n, last_ts = (state.get if state.exists else (0, None))
    for pdf in pdfs:
        n += len(pdf)
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None or mx > last_ts else last_ts
    state.update((n, last_ts))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "last_ts": [last_ts]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user cumulative event count carried in
    explicit group state across micro-batches (Arrow-batched)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(events: DataFrame, key_cols: tuple[str, ...] = ("event_id",),
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first arrival of each key wins; duplicate
    arrivals within the watermark horizon are dropped by engine-managed
    state (dropDuplicatesWithinWatermark), so state size is bounded by the
    horizon — the streaming face of operators/dedup.exact_dedup. At scale
    this is the at-least-once → effectively-once repair stage in front of
    the KG sink."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))
