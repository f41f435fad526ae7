"""Driver-checkable STREAMING evidence: deterministic replay queries.

The streaming operators (SURVEY §2.11) are pytest-covered, but a pytest
row is weaker evidence than a driver hash-green row. These queries run a
real Structured Streaming job — two micro-batches through the stateful
change router, state persisting between them in the checkpoint — over a
deterministic feed derived from the events table, then return the routed
result as a batch DataFrame. The classification semantics are pure SQL
over the same events table, so the ORACLE replays them with window
functions and the driver's value-hash certifies the stateful stream.

Determinism contract: each key (user) appears AT MOST ONCE per
micro-batch file, so the per-batch state transition is independent of
row order within the shuffled state groups; batch ORDER is fixed by
file modification times (FileStreamSource processes oldest first) and
``maxFilesPerTrigger=1`` forces one file per micro-batch. Every call
uses fresh temp spool/checkpoint/output dirs — the spool write is the
test-harness seam (files arrive from an external fetcher in
production, `sources/http.py`); the operator under test is the stream.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.plans.registry import register
from harvester_database_and_automation_spark.plans.shared import scratch_dir


@register(
    "streaming_change_router_replay",
    survey_ref="streaming-state,M2,W2",
    oracle="""
WITH fe AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
), firsts AS (SELECT user_id, event_type FROM fe WHERE rn_a = 1),
   lasts  AS (SELECT user_id, event_type FROM fe WHERE rn_d = 1)
SELECT CAST(user_id AS VARCHAR) AS id, event_type AS content_hash,
       'insert' AS change_kind
FROM firsts
UNION ALL
SELECT CAST(l.user_id AS VARCHAR), l.event_type,
       CASE WHEN l.event_type = f.event_type THEN 'unchanged' ELSE 'update' END
FROM lasts l JOIN firsts f ON f.user_id = l.user_id
""",
)
def streaming_change_router_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-micro-batch replay of the stateful content-hash change router
    (`streaming/changefeed.py`): batch 1 feeds each user's FIRST event
    (every key unseen -> insert), batch 2 feeds each user's LAST event —
    the router classifies it against the state persisted in the
    checkpoint from batch 1 (same type -> unchanged, changed -> update).
    The oracle derives the identical classification relationally, so the
    hash match certifies the state round-trip itself, not just the
    map logic.

    Scale shape: the router's state is one hash per key in the state
    store (sharded across executors); each micro-batch shuffles only
    (id, hash) pairs. The spool is Spark-written (`_spool_batches`:
    repartition(1) + rename, proper JSON encoding) — no driver-side row
    collection at any corpus size; production feeds land as files from
    the fetchers and the stream is unchanged."""
    from harvester_database_and_automation_spark.streaming.changefeed import (
        streaming_change_router,
    )

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w_first = (F.col("ts").asc(), F.col("event_id").asc())
    w_last = (F.col("ts").desc(), F.col("event_id").desc())
    from pyspark.sql import Window

    fe = e.withColumn(
        "rn_a", F.row_number().over(Window.partitionBy("user_id").orderBy(*w_first))
    ).withColumn("rn_d", F.row_number().over(Window.partitionBy("user_id").orderBy(*w_last)))
    firsts = fe.filter(F.col("rn_a") == 1).select(
        F.col("user_id").cast("string").alias("id"), F.col("event_type").alias("content_hash")
    )
    lasts = fe.filter(F.col("rn_d") == 1).select(
        F.col("user_id").cast("string").alias("id"), F.col("event_type").alias("content_hash")
    )

    root = scratch_dir(prefix="router_replay_")
    feed = _spool_batches(spark, root, [firsts, lasts], parent=fe)

    stream = (
        spark.readStream.schema("id string, content_hash string")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
    )
    out = os.path.join(root, "routed")
    with _stream_state_partitions(spark):
        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            # Plain append parquet per micro-batch: skips the streaming
            # parquet sink's per-batch manifest commit + _spark_metadata
            # log (pure fixed cost here). NOT idempotent under batch-level
            # re-execution in general — safe here only because availableNow
            # + a fresh per-run output dir + fresh checkpoint mean a failed
            # batch aborts the whole replay rather than retrying. Reusing
            # this sink with a long-lived checkpoint would need a
            # per-batch_id subdir (or an idempotent format) instead.
            batch_df.write.mode("append").parquet(out)

        q = (
            streaming_change_router(stream)
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).select("id", "content_hash", "change_kind")


@contextmanager
def _stream_state_partitions(spark: SparkSession, n: int = 4):
    """Run a micro-batch stream with ``n`` shuffle/state partitions.

    A stateful stream creates one state-store directory PER shuffle
    partition and checkpoints every one of them each micro-batch; at the
    session default (32) that is 32 delta files + CRC sidecars + commit
    metadata per batch for state that is a few thousand rows — pure
    filesystem overhead that dominated the replay family's bench cost
    (measured ~2x end-to-end at sf0.1). Every replay's contract is
    order- and partition-count-independent (exact integer aggregation,
    dedup, session merge, sketch algebra), so the state partition count
    is a pure knob. At 100 TB a real deployment raises it back with one
    conf — the number is fixed at FIRST query start by the checkpoint,
    which is fresh per replay.

    The conf is restored afterwards so the enclosing session (bench /
    driver / audit sweeps) is untouched; the spool derivation runs
    OUTSIDE this context at full parallelism.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _spool_batches(spark: SparkSession, root: str, batches, parent: DataFrame | None = None) -> str:
    """Write each batch DataFrame as ONE json file under root/feed with
    ascending mtimes (FileStreamSource processes oldest first), via a
    Spark write + rename — no driver-side row collection.

    ``parent``: an expensive shared frame the batches all filter (e.g. a
    row_number window over the full events table) — persisted for the
    duration of the writes so the window shuffle runs ONCE instead of
    once per batch file (measured ~2 full-corpus window passes saved on
    the three-batch replays)."""
    import glob
    import shutil

    if parent is not None:
        parent.persist()
        try:
            return _spool_batches(spark, root, batches)
        finally:
            parent.unpersist()
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    for i, df in enumerate(batches):
        stage = os.path.join(root, f"stage_{i}")
        # repartition(1), not coalesce(1): coalesce collapses the whole
        # upstream scan+derivation into the single writer task (measured
        # 3.6x on the 100x step for the CMS sink); repartition computes
        # upstream at full parallelism and ships only the batch rows to
        # one writer. Row order within the file is immaterial — every
        # replay's state contract is order-independent within a batch.
        df.repartition(1).write.json(stage)
        part = glob.glob(os.path.join(stage, "part-*"))[0]
        dst = os.path.join(feed, f"batch_{i}.json")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return feed


@register(
    "streaming_watermark_window_replay",
    survey_ref="streaming-watermark,A1,late-data",
    oracle="""
WITH ev AS (
  SELECT datediff('second', TIMESTAMP '2024-01-01', ts) AS s, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
b0 AS (SELECT * FROM ev WHERE s < 1296000),
b1 AS (SELECT * FROM ev WHERE s >= 1296000 AND s < 1900800),
b2 AS (SELECT * FROM ev WHERE s >= 1900800
       UNION ALL SELECT * FROM ev WHERE s < 259200),
-- Spark's two-watermark rule (SPARK-40925): batch N's LATE filter uses
-- the watermark IN EFFECT DURING batch N-1 (max event time through
-- batch N-2, minus the delay). Batches 0 and 1 therefore drop nothing;
-- batch 2's replays are filtered against max(b0) - 2h.
wmb1 AS (SELECT max(s) - 7200 AS w FROM b0),
kept AS (
  SELECT * FROM b0
  UNION ALL
  SELECT * FROM b1
  UNION ALL
  SELECT b2.s, b2.event_type, b2.cents FROM b2, wmb1
  WHERE b2.s - b2.s % 3600 + 3600 > wmb1.w
),
-- Append-mode emission: the final no-data batch advances the watermark
-- to max(all) - 2h and emits exactly the windows closed under it.
wmf AS (SELECT max(s) - 7200 AS w FROM ev),
agg AS (
  SELECT CAST(s - s % 3600 AS BIGINT) AS window_start_s,
         CAST(s - s % 3600 + 3600 AS BIGINT) AS window_end_s,
         event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS total_cents
  FROM kept GROUP BY 1, 2, 3
)
SELECT window_start_s, window_end_s, event_type, n_events, total_cents
FROM agg, wmf WHERE window_end_s <= wmf.w
""",
)
def streaming_watermark_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, hash-certified: THREE micro-batches through
    the watermarked tumbling-window aggregation (`streaming/windows.py`).
    Batch 0 = events before Jan 16, batch 1 = Jan 16-22, batch 2 = the
    remainder PLUS A REPLAY of the pre-Jan-4 rows — those duplicates
    arrive ~12 days behind the late-event watermark and the engine MUST
    drop them; if it failed, every early window's counts would double
    and the value hash would diverge. Three batches because of Spark's
    two-watermark rule (SPARK-40925, verified empirically here): batch
    N's LATE filter uses the watermark in effect during batch N-1 (max
    event time through batch N-2 − delay), while state EVICTION uses the
    current watermark — so replays must arrive two batches after the
    data that establishes the horizon. The oracle states the full
    discipline relationally: the late rule (window_end > filter
    watermark keeps a row), the emission rule (append mode emits windows
    with end <= final watermark — the trailing ~2h of windows stay open
    and unemitted even at stream end).

    Scale shape: state is one row per (window, key) bounded by the
    watermark horizon; the spool is Spark-written (repartition(1)+rename), no
    driver collection at any corpus size. The event-time column travels
    as INTEGER seconds-since-2024 and converts to an instant with
    ``timestamp_seconds`` (withWatermark requires TIMESTAMP, not NTZ);
    window boundaries come back out as integer seconds via
    ``unix_timestamp``, so no timezone rendering touches the contract
    under any driver session TZ."""
    from harvester_database_and_automation_spark.streaming.windows import (
        windowed_event_counts,
    )

    epoch_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z (hour-aligned)
    e = load_table(spark, sf_dir, "events").select(
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)")
        .cast("long")
        .alias("s"),
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    b0 = e.filter(F.col("s") < 1_296_000)
    b1 = e.filter((F.col("s") >= 1_296_000) & (F.col("s") < 1_900_800))
    b2 = e.filter(F.col("s") >= 1_900_800).unionByName(e.filter(F.col("s") < 259_200))

    root = scratch_dir(prefix="wm_replay_")
    feed = _spool_batches(spark, root, [b0, b1, b2], parent=e)
    stream = (
        spark.readStream.schema("s long, event_type string, cents long")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
        .withColumn("ts", F.timestamp_seconds(F.col("s") + epoch_2024))
    )
    agg = windowed_event_counts(
        stream, ts_col="ts", key_col="event_type", window="1 hour",
        watermark="2 hours", value_col="cents",
    )
    out = os.path.join(root, "windows")
    with _stream_state_partitions(spark):
        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            # Plain append parquet per micro-batch: skips the streaming
            # parquet sink's per-batch manifest commit + _spark_metadata
            # log (pure fixed cost here). NOT idempotent under batch-level
            # re-execution in general — safe here only because availableNow
            # + a fresh per-run output dir + fresh checkpoint mean a failed
            # batch aborts the whole replay rather than retrying. Reusing
            # this sink with a long-lived checkpoint would need a
            # per-batch_id subdir (or an idempotent format) instead.
            batch_df.write.mode("append").parquet(out)

        q = (
            agg
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).select(
        (F.unix_timestamp("window_start") - epoch_2024).cast("bigint").alias("window_start_s"),
        (F.unix_timestamp("window_end") - epoch_2024).cast("bigint").alias("window_end_s"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_value").cast("bigint").alias("total_cents"),
    )


@register(
    "streaming_dedup_replay",
    survey_ref="streaming-dedup,dedup-exact,A10",
    oracle="""
WITH fe AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_type AS first_type FROM fe WHERE rn = 1
""",
)
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming dedup, hash-certified: two micro-batches
    of each user's canonical row (user_id + first event type) with
    duplicates WITHIN batch 0 (every row written twice) and ACROSS the
    two batches (overlapping user groups), pushed through
    ``dropDuplicatesWithinWatermark`` (`streaming/dedup.py`). The output
    must contain every user's row EXACTLY once — a failure of the
    cross-batch key state would re-emit the overlap groups and break
    both the row count and the hash. Duplicate instances are bytewise
    identical, so which instance survives is immaterial; event time is
    constant so no row is late and no state evicts — the late/eviction
    discipline is certified separately by
    `streaming_watermark_window_replay`.

    Scale shape: state is one entry per key inside the horizon; each
    batch shuffles only (user_id, type) pairs; the spool is
    Spark-written."""
    from pyspark.sql import Window

    from harvester_database_and_automation_spark.streaming.dedup import dedup_within_watermark

    e = load_table(spark, sf_dir, "events")
    canonical = (
        e.withColumn(
            "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_type"), F.lit(0).cast("long").alias("s"))
    )
    g = F.col("user_id") % 3
    b0 = canonical.filter(g != 2)
    b0 = b0.unionByName(b0)  # within-batch duplicates
    # b1 overlaps b0 on the g == 1 third (cross-batch duplicates against
    # the checkpointed key state) and completes coverage with g == 2;
    # together the two batches cover every user exactly as the oracle
    # states. A third full-replay batch added one more micro-batch of
    # pure checkpoint overhead without new evidence — the state
    # round-trip is already certified by batch 1's overlap.
    b1 = canonical.filter(g != 0)

    root = scratch_dir(prefix="dedup_replay_")
    feed = _spool_batches(spark, root, [b0, b1], parent=canonical)
    stream = (
        spark.readStream.schema("user_id long, first_type string, s long")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
        .withColumn("ts", F.timestamp_seconds(F.col("s") + 1_704_067_200))
    )
    deduped = dedup_within_watermark(stream, ["user_id"], ts_col="ts", watermark="2 hours")
    out = os.path.join(root, "deduped")
    with _stream_state_partitions(spark):
        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            # Plain append parquet per micro-batch: skips the streaming
            # parquet sink's per-batch manifest commit + _spark_metadata
            # log (pure fixed cost here). NOT idempotent under batch-level
            # re-execution in general — safe here only because availableNow
            # + a fresh per-run output dir + fresh checkpoint mean a failed
            # batch aborts the whole replay rather than retrying. Reusing
            # this sink with a long-lived checkpoint would need a
            # per-batch_id subdir (or an idempotent format) instead.
            batch_df.write.mode("append").parquet(out)

        q = (
            deduped.select("user_id", "first_type")
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).select("user_id", "first_type")


@register(
    "streaming_upsert_publish_replay",
    survey_ref="M1,M4,streaming-ingest",
    oracle="""
WITH fe AS (
  SELECT user_id, event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
), firsts AS (SELECT user_id, event_type, cents FROM fe WHERE rn_a = 1),
   lasts  AS (SELECT user_id, event_type, cents FROM fe WHERE rn_d = 1)
SELECT f.user_id,
       CASE WHEN f.user_id % 3 = 0 THEN f.event_type ELSE l.event_type END AS etype,
       CAST(CASE WHEN f.user_id % 3 = 0 THEN f.cents ELSE l.cents END AS BIGINT) AS cents
FROM firsts f JOIN lasts l ON l.user_id = f.user_id
""",
)
def streaming_upsert_publish_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming WRITE path, hash-certified end-to-end: two
    micro-batches flow through the foreachBatch delta-merge sink
    (`streaming/upsert_sink.py` -> `operators/merge.merge_delta` ->
    `operators/publish.publish_versioned`), each batch atomically
    republishing the table. Batch 0 inserts every user's FIRST-event row;
    batch 1 overwrites every user with user_id % 3 != 0 with their
    LAST-event row. The final published table is
    therefore a MIXTURE no single batch contains — first-event rows for
    the %3==0 third, last-event rows for the rest — so a broken merge
    (lost inserts, unmatched overwrites, a reprocessed ledger entry) or
    a non-atomic publish diverges from the relational oracle.

    Scale shape: the file-source checkpoint is the processed-file
    ledger; every micro-batch runs the SAME batch merge the batch
    importers use (one write path, one conflict rule); the published
    table swaps atomically per version."""
    from pyspark.sql import Window

    from harvester_database_and_automation_spark.operators.publish import read_published
    from harvester_database_and_automation_spark.streaming.upsert_sink import (
        stream_upsert_into_published,
    )

    e = load_table(spark, sf_dir, "events")
    fe = e.withColumn(
        "rn_a", F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
    ).withColumn(
        "rn_d",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        ),
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents")
    firsts = fe.filter(F.col("rn_a") == 1).select(
        "user_id", F.col("event_type").alias("etype"), cents
    )
    lasts = fe.filter(F.col("rn_d") == 1).select(
        "user_id", F.col("event_type").alias("etype"), cents
    )
    b0 = firsts
    # One overwrite batch for both non-%3==0 thirds: the cross-batch
    # merge contract (batch 1 must overwrite rows INSERTED by batch 0
    # through the checkpointed ledger) is fully certified by two
    # batches; splitting the overwrites across two micro-batches only
    # doubled the per-batch checkpoint overhead for the same final
    # published table.
    b1 = lasts.filter(F.col("user_id") % 3 != 0)

    root = scratch_dir(prefix="upsert_replay_")
    feed = _spool_batches(spark, root, [b0, b1], parent=fe)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("etype", T.StringType()),
            T.StructField("cents", T.LongType()),
        ]
    )
    table = os.path.join(root, "published")
    with _stream_state_partitions(spark):
        stream_upsert_into_published(
            spark,
            feed,
            schema,
            os.path.join(root, "ckpt"),
            table,
            keys=["user_id"],
            fmt="json",
            reader_options={"maxFilesPerTrigger": "1"},
        )
    return read_published(spark, table).select(
        "user_id", "etype", F.col("cents").cast("bigint").alias("cents")
    )


@register(
    "streaming_session_window_replay",
    survey_ref="streaming-state,streaming-watermark,W2,A1",
    oracle="""
WITH ev AS (
  SELECT datediff('second', TIMESTAMP '2024-01-01', ts) AS s, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, event_id
  FROM events
),
g AS (
  SELECT *, CASE WHEN lag(s) OVER w IS NULL OR s - lag(s) OVER w > 1800
                 THEN 1 ELSE 0 END AS ns
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
),
sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
),
agg AS (
  SELECT user_id,
         CAST(min(s) AS BIGINT)        AS start_s,
         CAST(max(s) + 1800 AS BIGINT) AS end_s,
         CAST(count(*) AS BIGINT)      AS n_events,
         CAST(sum(cents) AS BIGINT)    AS total_cents
  FROM sess GROUP BY user_id, sid
),
wm AS (SELECT max(s) - 7200 AS w FROM ev)
SELECT start_s, end_s, user_id, n_events, total_cents
FROM agg, wm WHERE end_s <= w
""",
)
def streaming_session_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based SESSION windows through a real two-micro-batch stream
    (`streaming/windows.py::session_windowed_counts`,
    ``F.session_window`` + watermark): batch 0 is the first ~15 days of
    events, batch 1 the rest — every session that STRADDLES the split
    must merge with the open-session state persisted in the checkpoint
    from batch 0, so the value hash certifies the session-merge state
    round-trip, not just the gap logic. The oracle states the same
    semantics relationally (the islands pattern: lag + cumulative sum,
    the batch twin `event_sessionization` uses identically), with both
    engine boundary rules pinned EMPIRICALLY on synthetic edge rows:
    an event exactly ``gap`` after its predecessor CONTINUES the session
    (strict ``>`` starts a new one — session_window merges on
    next_start < current_end), and append mode emits a session whose
    end equals the final watermark (``end_s <= w``, same rule the
    tumbling-window replay measured). Sessions ending inside the
    trailing 2 h stay open and unemitted at stream end, exactly like
    the reference's poll-loop imports leave the current batch pending.

    Scale shape: state is one open session per (user, gap-island),
    evicted at the watermark; corpus-sized exchanges ship (user, s,
    cents) triples; the spool is Spark-written (repartition(1) + rename) — no
    driver-side collection at any corpus size. The event-time column
    travels as INTEGER seconds and converts via ``timestamp_seconds``
    (withWatermark requires TIMESTAMP); session bounds come back out as
    integer seconds via ``unix_timestamp``, so no timezone rendering
    touches the contract under any driver session TZ."""
    from harvester_database_and_automation_spark.streaming.windows import (
        session_windowed_counts,
    )

    epoch_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z
    e = load_table(spark, sf_dir, "events").select(
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)")
        .cast("long")
        .alias("s"),
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    b0 = e.filter(F.col("s") < 1_296_000)
    b1 = e.filter(F.col("s") >= 1_296_000)

    root = scratch_dir(prefix="session_replay_")
    feed = _spool_batches(spark, root, [b0, b1], parent=e)
    stream = (
        spark.readStream.schema("s long, user_id long, cents long")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
        .withColumn("ts", F.timestamp_seconds(F.col("s") + epoch_2024))
    )
    agg = session_windowed_counts(
        stream, ts_col="ts", key_col="user_id", gap="30 minutes",
        watermark="2 hours", value_col="cents",
    )
    out = os.path.join(root, "sessions")
    with _stream_state_partitions(spark):
        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            # Plain append parquet per micro-batch: skips the streaming
            # parquet sink's per-batch manifest commit + _spark_metadata
            # log (pure fixed cost here). NOT idempotent under batch-level
            # re-execution in general — safe here only because availableNow
            # + a fresh per-run output dir + fresh checkpoint mean a failed
            # batch aborts the whole replay rather than retrying. Reusing
            # this sink with a long-lived checkpoint would need a
            # per-batch_id subdir (or an idempotent format) instead.
            batch_df.write.mode("append").parquet(out)

        q = (
            agg
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).select(
        (F.unix_timestamp("session_start") - epoch_2024).cast("bigint").alias("start_s"),
        (F.unix_timestamp("session_end") - epoch_2024).cast("bigint").alias("end_s"),
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_value").cast("bigint").alias("total_cents"),
    )


@register(
    "streaming_stateful_ledger_replay",
    survey_ref="streaming-state,M6,A1",
    oracle="""
WITH ev AS (
  SELECT user_id, datediff('second', TIMESTAMP '2024-01-01', ts) AS s
  FROM events
),
c AS (
  SELECT user_id,
         sum(CASE WHEN s < 1296000 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN s >= 1296000 THEN 1 ELSE 0 END) AS n1
  FROM ev GROUP BY user_id
)
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(n0 AS BIGINT) AS total_seen,
       CAST(n0 AS BIGINT) AS new_in_batch
FROM c WHERE n0 > 0
UNION ALL
SELECT CAST(user_id AS VARCHAR),
       CAST(n0 + n1 AS BIGINT),
       CAST(n1 AS BIGINT)
FROM c WHERE n1 > 0
""",
)
def streaming_stateful_ledger_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM stateful operator (`streaming/stateful.py::
    running_dedup_counts`, ``applyInPandasWithState``) as driver-hash
    evidence — previously pytest-only, the last §2.11 family without a
    green driver row. Two micro-batches of events keyed by user flow
    through the per-key running ledger (the reference's
    process-new-remember-progress loops, import_nextclade.R:197-209 /
    OriginCountryEstimator.java:189-209): batch 1's ``total_seen`` must
    equal batch 0's checkpointed total plus the increment, so the value
    hash certifies the GroupState round-trip arithmetic itself. Update
    mode emits one row per touched key per batch; parquet doesn't
    support update sinks, so the stream lands through ``foreachBatch``
    append — exactly the ledger shape a production incremental job
    writes. The oracle states both emissions relationally from the
    batch-range counts.

    Scale shape: state is ONE bigint per key sharded across the state
    store; each micro-batch shuffles only (key) rows into their state
    partitions; Arrow-batched pandas transport (the applyInPandasWithState
    contract), no driver-side collection — the spool is Spark-written."""
    from harvester_database_and_automation_spark.streaming.stateful import (
        running_dedup_counts,
    )

    e = load_table(spark, sf_dir, "events").select(
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)")
        .cast("long")
        .alias("s"),
        F.col("user_id").cast("string").alias("key"),
    )
    b0 = e.filter(F.col("s") < 1_296_000).select("key")
    b1 = e.filter(F.col("s") >= 1_296_000).select("key")

    root = scratch_dir(prefix="ledger_replay_")
    feed = _spool_batches(spark, root, [b0, b1], parent=e)
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
    )
    out = os.path.join(root, "ledger")
    os.makedirs(out)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    with _stream_state_partitions(spark):
        q = (
            running_dedup_counts(stream, key_col="key")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).select("key", "total_seen", "new_in_batch")


def _cms_replay_oracle() -> str:
    from harvester_database_and_automation_spark.plans.text import _split_md5_sql

    return f"""
WITH keys AS (SELECT event_type AS k FROM events),
truth AS (SELECT k, count(*) AS true_count FROM keys GROUP BY k),
kh AS ({_split_md5_sql("k", cols="", src="keys")}),
cells AS (
  SELECT j, (h1 + j * h2) % 1024 AS pos, count(*) AS c
  FROM kh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)
  GROUP BY 1, 2
),
ph AS ({_split_md5_sql("k", cols="true_count,", src="truth")}),
est AS (
  SELECT k, true_count, min(COALESCE(c.c, 0)) AS cms_estimate
  FROM (
    SELECT k, true_count, j, (h1 + j * h2) % 1024 AS pos
    FROM ph CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)
  ) q
  LEFT JOIN cells c ON c.j = q.j AND c.pos = q.pos
  GROUP BY k, true_count
)
SELECT k AS event_type,
       CAST(true_count AS BIGINT)                AS true_count,
       CAST(cms_estimate AS BIGINT)              AS cms_estimate,
       CAST(cms_estimate - true_count AS BIGINT) AS overcount
FROM est
"""


@register(
    "streaming_cms_sink_replay",
    survey_ref="streaming-state,sketch-frequency,M4,A1",
    oracle=_cms_replay_oracle(),
)
def streaming_cms_sink_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming SKETCH SINK as driver-hash evidence (previously
    pytest-only): two micro-batches of event keys flow through
    `streaming/sketch_sink.py::stream_cms_into_published` — each batch
    sketches ONLY its own rows into a (4 x 1024) Count-Min delta grid and
    the published table advances prior ⊕ delta through the versioned
    atomic pointer (exactly-once: the producing batch id publishes with
    the grid). The final published grid must be CELL-IDENTICAL to a
    single-shot sketch of all rows (sketch mergeability is exact integer
    algebra), so estimating every event type from the published grid and
    hash-comparing against the oracle's single-shot grid certifies the
    merge loop, the idempotence metadata, and the publish protocol in
    one row set. The frequency-monitoring shape of the reference's
    per-ingest refresh cadence (refreshes.sql) — the summary stays
    current without ever rescanning the accumulated corpus.

    Scale shape: per batch, the raw key stream reduces map-side to
    <= 4096 (j, pos, c) cells; the published grid is KB-sized; the merge
    is a groupBy over <= 2*4096 rows. No corpus-sized state anywhere."""
    from pyspark.sql import types as T

    from harvester_database_and_automation_spark.operators.publish import read_published
    from harvester_database_and_automation_spark.operators.sketches import (
        count_min_estimate,
    )
    from harvester_database_and_automation_spark.streaming.sketch_sink import (
        stream_cms_into_published,
    )

    e = load_table(spark, sf_dir, "events").select(
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)")
        .cast("long")
        .alias("s"),
        F.col("event_type").alias("k"),
    )
    b0 = e.filter(F.col("s") < 1_296_000).select("k")
    b1 = e.filter(F.col("s") >= 1_296_000).select("k")

    root = scratch_dir(prefix="cms_sink_replay_")
    feed = _spool_batches(spark, root, [b0, b1], parent=e)
    table_dir = os.path.join(root, "cms_table")
    with _stream_state_partitions(spark):
        stream_cms_into_published(
            spark,
            feed,
            T.StructType([T.StructField("k", T.StringType())]),
            checkpoint_dir=os.path.join(root, "ckpt"),
            table_dir=table_dir,
            col="k",
            width=1024,
            depth=4,
            fmt="json",
            reader_options={"maxFilesPerTrigger": "1"},
        )
    cells = read_published(spark, table_dir)
    truth = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("k"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    est = count_min_estimate(cells, truth, "k", width=1024, depth=4)
    return est.select(
        F.col("k").alias("event_type"),
        F.col("true_count").cast("bigint").alias("true_count"),
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("true_count")).cast("bigint").alias("overcount"),
    )
