"""Watermarked stream-stream interval join.

The reference never joins two live feeds (its poll loops land files, then
batch SQL joins tables), but the continuous version of its
"sequence arrives, metadata arrives later, pair them" pattern
(BatchProcessingWorker.java:214-297 pairing sequences with test metadata)
is a stream-stream join. Spark requires time bounds so state can be
evicted: both sides carry watermarks and the join predicate constrains the
event-time gap, so each side buffers only rows inside the watermark+gap
horizon — state is O(rate × window), not unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` where ``right_ts`` falls within
    [``left_ts`` - max_lag, ``left_ts``] — "the right event at most
    ``max_lag`` before the left one". Column names besides ``on`` must be
    disjoint. Batch DataFrames run through the identical plan (watermarks
    are no-ops), so oracle tests can replay it.

    ``how``: inner, or left_outer/right_outer (outer rows emit once the
    watermark proves no match can arrive).
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l[on] == r[on])
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
    )
    joined = l.join(r, cond, how)
    # Surviving join key: an unmatched outer row has NULLs on the other
    # side, so keeping only one side's key would emit key=NULL for every
    # watermark-expired right row (or left row, for left_outer) — coalesce
    # both sides into the single output key instead.
    cols = (
        [F.coalesce(l[on], r[on]).alias(on)]
        + [l[c] for c in l.columns if c != on]
        + [r[c] for c in r.columns if c != on]
    )
    return joined.select(*cols)
