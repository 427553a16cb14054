"""Streaming windowed aggregation + stateful operator, driven synchronously
(memory sink + availableNow), verified against batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_pdf_md_spark.streaming.windows import (
    read_event_stream,
    running_user_counts,
    windowed_counts,
)

SF_EVENTS = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    out = str(tmp_path / "events")
    spark.read.parquet(f"{SF_EVENTS}/events.parquet") \
        .repartition(4).write.parquet(out)
    return out


def test_windowed_counts_match_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    # complete mode: append would (correctly) withhold windows the watermark
    # hasn't passed at end-of-input; complete emits the full aggregate so the
    # batch comparison is exact. The watermark still bounds engine state.
    q = (windowed_counts(stream).writeStream.outputMode("complete")
         .format("memory").queryName("wc_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM wc_out").toPandas() \
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        .toPandas().sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    import pandas as pd
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_stateful_running_counts(spark, events_dir):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (running_user_counts(stream).writeStream.outputMode("update")
         .format("memory").queryName("ruc_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # last update per user = total count (state survived micro-batches,
    # exercised by 1-file triggers over 4 files)
    from pyspark.sql import Window
    out = spark.sql("SELECT * FROM ruc_out")
    # updates are appended per batch; the max n_events per user is the final state
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    batch = spark.read.parquet(events_dir).groupBy("user_id") \
        .agg(F.count("*").alias("n_events"))
    diff = final.join(batch, "user_id") \
        .filter(final.n_events != batch.n_events).count()
    assert diff == 0
    # multiple micro-batches actually happened (state carried across them)
    n_updates = out.count()
    n_users = batch.count()
    assert n_updates > n_users


def test_streaming_dedup_drops_duplicate_arrivals(spark, tmp_path):
    """Plant the same events file twice in the stream dir: the deduped
    stream must emit each event_id exactly once (= batch distinct)."""
    from smart_pdf_md_spark.streaming.windows import streaming_dedup

    src = spark.read.parquet(f"{SF_EVENTS}/events.parquet").limit(500)
    out = str(tmp_path / "dup_events")
    src.write.parquet(out)
    src.write.mode("append").parquet(out)  # every row arrives twice

    stream = read_event_stream(spark, out)
    q = (streaming_dedup(stream).writeStream
         .format("memory").queryName("dedup_sink")
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(120)
    got = spark.table("dedup_sink").toPandas()
    assert len(got) == src.count()
    assert got["event_id"].is_unique
