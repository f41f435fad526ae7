"""As-of (point-in-time) join — for each left row, the most recent right
row with ``right_time <= left_time`` in the same key group.

Spark has no ASOF JOIN operator (DuckDB/kdb do), and the naive encodings
are poison at scale: a per-row correlated subquery doesn't distribute, and
a range join (``l.ts >= r.ts``) explodes to O(|L|·|R|) per key before the
"latest" filter. The scalable formulation is union + ordered window:

1. tag right rows side=0 and left rows side=1,
2. union on (key, time, side),
3. one window per key ordered by (time, side, seq):
   ``last(right_payload, ignorenulls=True)`` over unbounded-preceding rows,
4. keep side=1 rows.

One shuffle by key, one sort — the same cost as any W2 windowed query, no
pair blow-up. Equal timestamps are inclusive (side 0 sorts before side 1),
and ``seq_col`` makes the winner among same-instant right rows
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    seq_col: str | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """Return every ``left`` row plus the latest-at-or-before ``right``
    payload (``direction="backward"``), or the earliest-at-or-after one
    (``direction="forward"`` — the same plan traversing time reversed).
    Right payload = all right columns except ``on`` (each emitted as
    ``prefix + name``; NULL when no right row qualifies).

    ``seq_col``: right column ordering same-instant right rows (the max
    wins); pass it whenever (on, right_time) is not unique and you need
    deterministic output.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    payload_cols = [c for c in right.columns if c != on]
    left_types = {f.name: f.dataType for f in left.schema.fields}

    r = right.select(
        F.col(on),
        F.col(right_time).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        (F.col(seq_col).cast("long") if seq_col else F.lit(None).cast("long")).alias("_asof_seq"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload"),
        # left columns ride along as typed NULLs so the union lines up
        *[F.lit(None).cast(left_types[c]).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on),
        F.col(left_time).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast("long").alias("_asof_seq"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    t_order = F.col("_asof_t").asc() if direction == "backward" else F.col("_asof_t").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(t_order, F.col("_asof_side").asc(), F.col("_asof_seq").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_asof_hit", F.last("_asof_payload", ignorenulls=True).over(w))
        .filter(F.col("_asof_side") == 1)
    )
    return matched.select(
        F.col(on),
        *[F.col(f"_l_{c}").alias(c) for c in left.columns if c != on],
        *[F.col(f"_asof_hit.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
