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


@pytest.mark.slow
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


@pytest.mark.slow
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


def _write_event_file(spark, path: str, rows, mtime: int):
    """One parquet file per micro-batch, mtime-ordered so the file stream
    source (oldest-first) delivers batches in controlled order."""
    import glob
    import os

    df = spark.createDataFrame(
        [(eid, ts, uid, "click", 1.0, "{}") for eid, ts, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    df.coalesce(1).write.mode("append").parquet(path)
    newest = max(glob.glob(os.path.join(path, "*.parquet")),
                 key=os.path.getmtime)
    os.utime(newest, (mtime, mtime))


@pytest.mark.slow
def test_stateful_sessions_event_time_timeout(spark, tmp_path):
    """applyInPandasWithState with EventTimeTimeout: sessions close exactly
    once, only when the watermark proves them unextendable; open tails and
    below-watermark late rows never surface."""
    from datetime import datetime, timedelta

    from smart_pdf_md_spark.streaming.windows import stateful_sessions

    t0 = datetime(2025, 1, 1, 0, 0, 0)
    mn = timedelta(minutes=1)
    path = str(tmp_path / "sess_events")
    # batch 1 — session A per user (u1: 3 events OUT OF ORDER, u2: 1 event)
    _write_event_file(spark, path, [
        (3, t0 + 20 * mn, 1), (1, t0, 1), (2, t0 + 10 * mn, 1),
        (10, t0 + 5 * mn, 2),
    ], mtime=1_000)
    # batch 2 — session B (u1), 2h after A (gap 30min => new session)
    _write_event_file(spark, path, [
        (4, t0 + 120 * mn, 1), (5, t0 + 125 * mn, 1),
    ], mtime=2_000)
    # batch 3 — session C (u1) far later: advances the watermark past B+gap
    _write_event_file(spark, path, [(6, t0 + 1000 * mn, 1)], mtime=3_000)
    # batch 4 — flush events for BOTH users (every key gets rows, so the
    # closable check runs under the post-batch-3 watermark), plus a
    # below-watermark late row (eid 99) that must be dropped, not sessioned
    _write_event_file(spark, path, [
        (7, t0 + 2000 * mn, 1), (11, t0 + 2000 * mn, 2),
        (99, t0 + 1 * mn, 2),
    ], mtime=4_000)

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", "1").parquet(path))
    q = (stateful_sessions(stream, gap_sec=1800, watermark="10 minutes")
         .writeStream.outputMode("append").format("memory")
         .queryName("sess_out").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in spark.sql("SELECT * FROM sess_out").collect()}

    # closed: u1 A (3 events, 0..20min), u1 B (2 events), u2 A (1 event).
    # open tails (u1/u2 flush events, u1 session C) and the late eid-99 row
    # must NOT appear.
    assert got == {
        (1, t0, t0 + 20 * mn, 3),
        (1, t0 + 120 * mn, t0 + 125 * mn, 2),
        (2, t0 + 5 * mn, t0 + 5 * mn, 1),
    }


@pytest.mark.slow
def test_stateful_sessions_subset_of_batch(spark, tmp_path):
    """On the real events table delivered in bounded-disorder order
    (time-range files, the Kafka-partition assumption the watermark
    contract is about), every emitted session must be exactly a session
    the batch gap rule produces (same 1800s rule as w3_sessionize); no
    duplicates across micro-batches. Unbounded disorder would instead
    (correctly) drop beyond-watermark rows and fragment those sessions."""
    import glob
    import os

    import pandas as pd

    from smart_pdf_md_spark.streaming.windows import stateful_sessions

    events_dir = str(tmp_path / "events_ranged")
    spark.read.parquet(f"{SF_EVENTS}/events.parquet") \
        .repartitionByRange(4, "ts").sortWithinPartitions("ts") \
        .write.parquet(events_dir)
    # mtime-order the range files by their min ts so oldest-first delivery
    # matches event time
    files = glob.glob(os.path.join(events_dir, "*.parquet"))
    mins = {f: spark.read.parquet(f).agg(F.min("ts")).collect()[0][0]
            for f in files}
    for i, f in enumerate(sorted(files, key=lambda f: mins[f])):
        os.utime(f, (1_000 + i, 1_000 + i))

    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (stateful_sessions(stream, gap_sec=1800, watermark="30 minutes")
         .writeStream.outputMode("append").format("memory")
         .queryName("sess_real").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sess_real").toPandas()
    assert len(got) == len(got.drop_duplicates())  # exactly-once emission

    ev = spark.read.parquet(events_dir).select("user_id", "ts", "event_id") \
        .toPandas().sort_values(["user_id", "ts", "event_id"])
    want = set()
    for uid, g in ev.groupby("user_id"):
        ts = g["ts"].tolist()
        start, n = ts[0], 1
        for prev, cur in zip(ts, ts[1:]):
            if (cur - prev) > pd.Timedelta(seconds=1800):
                want.add((uid, start, prev, n))
                start, n = cur, 1
            else:
                n += 1
        want.add((uid, start, ts[-1], n))
    emitted = {(r.user_id, r.session_start, r.session_end, r.n_events)
               for r in got.itertuples(index=False)}
    assert emitted <= want, f"phantom sessions: {list(emitted - want)[:3]}"
    assert len(emitted) > 0


@pytest.mark.slow
def test_stateful_sessions_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state recovery: drain batch 1 (session tail
    buffered in state), STOP the query, start a NEW query on the same
    checkpoint for batch 2 — the restored buffer merges with the new rows
    into ONE session, emitted exactly once."""
    from datetime import datetime, timedelta

    from smart_pdf_md_spark.streaming.windows import stateful_sessions

    t0 = datetime(2025, 6, 1)
    mn = timedelta(minutes=1)
    path = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions_out")

    def drain():
        # foreachBatch parquet sink: the memory sink refuses checkpoint
        # recovery, and recovery is exactly what this test is about
        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(out)

        stream = (spark.readStream
                  .schema("event_id long, ts timestamp, user_id long, "
                          "event_type string, value double, props string")
                  .option("maxFilesPerTrigger", "1").parquet(path))
        q = (stateful_sessions(stream, gap_sec=1800, watermark="10 minutes")
             .writeStream.outputMode("append").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # batch 1: first half of a session (events at t0, t0+10min)
    _write_event_file(spark, path, [(1, t0, 1), (2, t0 + 10 * mn, 1)],
                      mtime=1_000)
    drain()  # query 1 ends; session tail lives only in checkpointed state

    # NEW query, same checkpoint: session continues at +20min; then two
    # far-future batches (the watermark a batch runs under comes from the
    # PREVIOUS batch's max, so closing needs one batch past the advance)
    _write_event_file(spark, path, [(3, t0 + 20 * mn, 1)], mtime=2_000)
    _write_event_file(spark, path, [(4, t0 + 1000 * mn, 1)], mtime=3_000)
    _write_event_file(spark, path, [(5, t0 + 2000 * mn, 1)], mtime=4_000)
    drain()

    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in spark.read.parquet(out).collect()}
    # ONE 3-event session spanning the restart — the pre-restart buffer was
    # recovered, not re-emitted and not lost
    assert got == {(1, t0, t0 + 20 * mn, 3)}
