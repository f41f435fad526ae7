"""Distance/range join — pair rows whose numeric points lie within a
maximum distance — without a nested loop.

Spark plans a bare ``|a.x - b.y| <= d`` join as BroadcastNestedLoopJoin /
CartesianProduct: O(|L|·|R|) comparisons, dead at scale. The standard
bucketed formulation makes it an equi-join:

1. bucket both sides by ``floor(point / width)`` with ``width = d``,
2. replicate only the LEFT side into its own and both adjacent buckets
   (3x left rows — cheap, and any |l-r| <= d pair is guaranteed to share
   exactly one (bucket_left + offset == bucket_right) combination, so no
   pair is ever produced twice),
3. shuffle-equi-join on the bucket id, post-filter the exact distance.

Cost is proportional to true collisions per bucket (data density × d),
never |L|·|R|. The same trick serves time-window joins: convert event time
to epoch seconds first (``timestampdiff`` against a fixed origin keeps the
arithmetic timezone-free for TIMESTAMP_NTZ columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_point: str,
    max_distance: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Inner-join ``left`` × ``right`` on ``abs(left_point - right_point)
    <= max_distance`` (plus optional ``extra_on`` equi-keys). Column names
    must be disjoint apart from ``extra_on``. Each qualifying pair appears
    exactly once."""
    if max_distance <= 0:
        raise ValueError("max_distance must be positive")
    width = F.lit(max_distance)
    extra = extra_on or []

    overlap = (set(left.columns) & set(right.columns)) - set(extra)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")

    l = left.withColumn(
        "_rj_bucket",
        F.explode(
            F.array(
                *[
                    (F.floor(F.col(left_point) / width) + off).cast("long")
                    for off in (-1, 0, 1)
                ]
            )
        ),
    )
    r = right.withColumn("_rj_bucket", F.floor(F.col(right_point) / width).cast("long"))
    joined = l.join(r, ["_rj_bucket", *extra], "inner").filter(
        F.abs(F.col(left_point) - F.col(right_point)) <= width
    )
    return joined.drop("_rj_bucket")
