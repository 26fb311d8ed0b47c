"""Structured Streaming operators over the events stream table.

The reference is batch-only (SURVEY §2.6) and the north rule needs no
streaming, but a complete engine for training-data pipelines ingests
event streams too: watermarked windowed aggregation and a stateful-ish
sessionization, both expressed as standard Structured Streaming plans
(file source here; kafka on a real cluster — same logical plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema pinned — no
    inference on a stream)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the streaming file source watches a DIRECTORY; filter to the events
    # file. Watermarks require TIMESTAMP event time (parquet ts is NTZ).
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — late rows
    beyond the watermark are dropped, state is bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based) — the streaming counterpart
    of the batch lag/cumsum sessionization pattern."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            "user_id",
            "n_events",
        )
    )


def run_stream_to_memory(spark: SparkSession, agg: DataFrame, name: str) -> DataFrame:
    """Drive a bounded file-source stream to completion synchronously and
    return the materialized sink as a batch DataFrame."""
    # complete mode so a bounded source also surfaces sessions still
    # behind the watermark (append would hold them as pending state)
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


RUNNING_STATS_SCHEMA = (
    "user_id long, n_events long, total_value double, max_value double, "
    "n_batches int"
)
_RUNNING_STATE_SCHEMA = "n long, total double, mx double, batches int"


def running_user_stats(events: DataFrame, timeout_minutes: int = 60) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum, max) maintained across micro-batches — the
    arbitrary-state API for aggregations session_window/window can't
    express (e.g. monotonic counters with custom eviction). State times
    out after ``timeout_minutes`` of event-time inactivity and the final
    row is emitted."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total, mx, batches = (
            state.get if state.exists else (0, 0.0, float("-inf"), 0)
        )
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                    "n_batches": [batches],
                }
            )
            return
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        batches += 1
        state.update((n, total, mx, batches))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeout_minutes * 60_000)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "max_value": [mx],
                "n_batches": [batches],
            }
        )

    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_RUNNING_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def encode_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    trigger_once: bool = False,
    **encode_kwargs,
):
    """Stream-ingest into the encoded blocks table: each micro-batch runs
    one append `encode_table` job, committing one snapshot (engine.py
    snapshot log) when every part of the batch is durably checkpointed.

    Exactly-once composition: Spark's streaming checkpoint
    (``checkpoint_dir``) makes batch replay the only failure mode. Every
    committed snapshot carries a ``stream`` tag of (checkpoint dir,
    batch_id), so a replayed batch whose snapshot already committed —
    crash between sink success and the streaming offset commit — is a
    no-op instead of re-encoding duplicate rows under a fresh part-id
    base. A replay of a *partially* written batch re-enters
    `encode_table(append=True, resume=True)` whose part checkpoints make
    the re-run idempotent. Readers see either the previous snapshot or
    the complete new one (decode_table resolves the snapshot log), never
    a torn batch. The tag is scoped by checkpoint dir: a new query with a
    fresh checkpoint restarts batch ids at 0 without colliding.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    from .engine import encode_table, snapshots

    ckpt_key = os.path.abspath(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        tag = [ckpt_key, int(batch_id)]
        if any(s.get("stream") == tag for s in snapshots(out_dir)):
            # replay of a fully committed batch: exactly-once no-op. The
            # crash that caused the replay may have hit between the
            # snapshot commit and encode_table's pending-file cleanup; a
            # stale _pending_append.json would make the NEXT batch reuse
            # this batch's part-id base and anti-join its rows away, so
            # finish the cleanup here (single-writer contract).
            from .engine import _exists, _get_fs, _j

            pend = _j(out_dir, "_pending_append.json")
            if _exists(pend):
                _get_fs(out_dir).remove(pend)
            return
        encode_table(
            batch_df.sparkSession,
            batch_df,
            out_dir,
            append=True,
            resume=True,
            snapshot_extra={"stream": tag},
            **encode_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    *,
    trigger_once: bool = False,
    **upsert_kwargs,
):
    """CDC-style streaming MERGE: each micro-batch upserts by ``key_col``
    — rows whose key exists replace the stored rows, new keys append —
    committing ONE atomic snapshot per batch (``engine.upsert_rows``).

    Exactly-once composition mirrors :func:`encode_stream`: the combined
    merge entry carries a ``stream`` tag of (checkpoint dir, batch_id)
    — caller-scoped keys survive the merge commit — so a replayed batch
    whose snapshot already committed is a no-op. A replay of a batch
    whose merge never committed re-runs against the unchanged pre-merge
    table (the interrupted attempt left only invisible orphan parts), so
    the retry produces the same post-merge state. Duplicate keys WITHIN
    one micro-batch are collapsed to one row per key here (micro-batch
    DataFrames carry no inherent order, so the survivor is arbitrary —
    pre-aggregate upstream, e.g. a max-by on an event-time column, if
    "latest wins" must follow a specific ordering); across batch
    boundaries the later batch's merge replaces the earlier rows.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    from .engine import snapshots, upsert_rows

    ckpt_key = os.path.abspath(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        tag = [ckpt_key, int(batch_id)]
        if any(s.get("stream") == tag for s in snapshots(out_dir)):
            # replay of a fully committed merge: exactly-once no-op.
            # (Unlike encode_stream there is no stale-pending cleanup
            # here: the merge's commit happens strictly AFTER
            # encode_table removed _pending_append.json, so "tag
            # committed" and "pending exists" cannot co-occur.)
            return
        upsert_rows(
            batch_df.sparkSession,
            # one row per key per batch: upsert_rows keeps EVERY copy of
            # an in-batch duplicate key (its delete side only removes
            # STORED rows), which would break this sink's documented
            # per-key semantics
            batch_df.dropDuplicates([key_col]),
            out_dir,
            key_col,
            snapshot_extra={"stream": tag},
            **upsert_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
