"""Streaming windowed aggregation + custom stateful operator.

The reference has no streaming (SURVEY.md §2.9); these exist because a
KG-construction service at scale ingests repo events continuously. The
shapes are the canonical Structured-Streaming ones:

- tumbling-window counts with a watermark (late rows beyond the watermark
  are dropped by the engine, not by user code);
- per-key running state via ``applyInPandasWithState`` — the custom-stateful
  escape hatch (here: cumulative per-user event count + last-seen timestamp,
  the building block of streaming dedup/session state);
- stateful sessionization with ``GroupStateTimeout.EventTimeTimeout`` —
  completed sessions emitted exactly once when the watermark proves them
  unextendable (the streaming face of the batch w3_sessionize gap rule).
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


# ---------------------------------------------------------------------------
# Stateful streaming sessionization (event-time timeout).
#
# The streaming face of the batch w3_sessionize query: same gap rule
# (a >gap_sec silence closes the session), but sessions close as the
# WATERMARK passes session_end + gap — engine-scheduled state expiry via
# GroupStateTimeout.EventTimeTimeout, the piece running_user_counts
# (NoTimeout) doesn't exercise. Per key the state is the buffer of events
# not yet attributable to a closed session, so state size is bounded by
# the watermark horizon × per-user event rate, never the full history.
# ---------------------------------------------------------------------------

_SESS_STATE_SCHEMA = "ts array<long>, eid array<long>"  # epoch-µs + event ids
_SESS_OUT_SCHEMA = ("user_id long, session_start timestamp, "
                    "session_end timestamp, n_events long")


def _split_sessions(pairs: list[tuple[int, int]], gap_us: int) -> list[list[tuple[int, int]]]:
    """(ts_µs, event_id) sorted → sessions split at >gap_us silences
    (same rule as the batch query: lag gap > 1800s starts a new session)."""
    sessions: list[list[tuple[int, int]]] = []
    for p in pairs:
        if sessions and p[0] - sessions[-1][-1][0] <= gap_us:
            sessions[-1].append(p)
        else:
            sessions.append([p])
    return sessions


def make_session_updater(gap_sec: int = 1800):
    import pandas as pd

    # state keeps epoch MICROseconds: parquet timestamps are µs-precision,
    # and session boundaries must round-trip exactly vs the batch rule
    gap_us = gap_sec * 1_000_000

    def update(key, pdfs, state: GroupState):
        def emit(sessions):
            return pd.DataFrame({
                "user_id": [key[0]] * len(sessions),
                "session_start": [pd.Timestamp(s[0][0], unit="us") for s in sessions],
                "session_end": [pd.Timestamp(s[-1][0], unit="us") for s in sessions],
                "n_events": [len(s) for s in sessions],
            })

        wm_us = state.getCurrentWatermarkMs() * 1000
        buf_ts, buf_eid = (state.get if state.exists else ([], []))
        pairs = list(zip(buf_ts, buf_eid))
        if state.hasTimedOut:
            # watermark passed last_ts + gap: nothing can extend or split
            # the buffered tail — flush every remaining session
            state.remove()
            if pairs:
                yield emit(_split_sessions(sorted(pairs), gap_us))
            return
        for pdf in pdfs:
            # pin ns resolution before the int cast: a [us]-typed series
            # (pandas-2 Arrow path) would silently land 1000× off
            ts = pdf["ts"].astype("datetime64[ns]")
            us = (ts.astype("int64") // 1_000).tolist()
            pairs += [p for p in zip(us, pdf["event_id"].tolist())
                      if p[0] >= wm_us]  # beyond-watermark late rows dropped
        pairs.sort()
        sessions = _split_sessions(pairs, gap_us)
        # closable = the watermark guarantees no future row can extend it
        closed = [s for s in sessions if s[-1][0] + gap_us <= wm_us]
        open_ = [p for s in sessions if s[-1][0] + gap_us > wm_us for p in s]
        if open_:
            state.update(([p[0] for p in open_], [p[1] for p in open_]))
            # ceil to ms so the timeout never fires before last+gap in µs
            state.setTimeoutTimestamp(-(-(open_[-1][0] + gap_us) // 1000))
        else:
            state.remove()
        if closed:
            yield emit(closed)

    return update


def stateful_sessions(events: DataFrame, gap_sec: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Completed sessions (user_id, session_start, session_end, n_events),
    emitted exactly once each, as soon as the event-time watermark proves
    them unextendable. Append-mode sink."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_updater(gap_sec),
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
