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
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.plans.registry import register


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
    (id, hash) pairs. The driver-side spool here is the harness seam —
    production feeds land as files from the fetchers and the stream is
    unchanged."""
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
    firsts = (
        fe.filter(F.col("rn_a") == 1)
        .select(F.col("user_id").cast("string").alias("id"), F.col("event_type").alias("h"))
        .orderBy("id")
        .collect()
    )
    lasts = (
        fe.filter(F.col("rn_d") == 1)
        .select(F.col("user_id").cast("string").alias("id"), F.col("event_type").alias("h"))
        .orderBy("id")
        .collect()
    )

    root = tempfile.mkdtemp(prefix="router_replay_")
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    for i, rows in enumerate((firsts, lasts)):
        path = os.path.join(feed, f"batch_{i}.json")
        with open(path, "w") as fh:
            for r in rows:
                fh.write('{"id": "%s", "content_hash": "%s"}\n' % (r["id"], r["h"]))
        # FileStreamSource processes files oldest-first: pin the order.
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (
        spark.readStream.schema("id string, content_hash string")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
    )
    out = os.path.join(root, "routed")
    q = (
        streaming_change_router(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).select("id", "content_hash", "change_kind")
