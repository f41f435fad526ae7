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


def interval_containment_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
    max_buckets_per_interval: int = 65536,
) -> DataFrame:
    """Inner-join variable-length intervals to the points they CONTAIN
    (``start <= point <= end``, plus optional ``extra_on`` equi-keys)
    without a nested loop.

    The interval side explodes to every bucket its span overlaps
    (``floor(start/w) .. floor(end/w)`` — replication cost is total
    interval length / width, so pick ``bucket_width`` near the typical
    interval length); each point lands in exactly ONE bucket, so every
    qualifying (interval, point) pair meets in precisely the point's
    bucket — no dedup pass needed. The equi-join on bucket makes the
    cost collisions-per-bucket, never |intervals| x |points|.

    Degenerate intervals (``end < start``) are dropped up front: they
    can contain nothing, and Spark's ``sequence(a, b)`` runs DESCENDING
    when b < a instead of returning an empty array.

    ``max_buckets_per_interval`` guards the explode: an interval whose
    span/width ratio is pathological (mis-sized ``bucket_width``, a
    sentinel end date like 9999-12-31) would otherwise replicate itself
    into millions of buckets — and past ~2^31 Spark's ``sequence`` dies
    with an opaque array-size error mid-stage. The guard raises a CLEAR
    in-plan error naming the offending span and the knob to turn; it is
    a correctness tripwire, not a silent clamp (dropping buckets would
    lose matches)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if max_buckets_per_interval <= 0:
        raise ValueError("max_buckets_per_interval must be positive")
    extra = extra_on or []
    overlap = (set(intervals.columns) & set(points.columns)) - set(extra)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    width = F.lit(bucket_width)
    lo = F.floor(F.col(start_col) / width).cast("long")
    hi = F.floor(F.col(end_col) / width).cast("long")
    span = hi - lo + F.lit(1)
    # CASE WHEN evaluates lazily, so the error fires only on offending rows.
    guarded = F.when(span <= F.lit(max_buckets_per_interval), F.sequence(lo, hi)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_containment_join: an interval spans "),
                span.cast("string"),
                F.lit(
                    f" buckets (max_buckets_per_interval={max_buckets_per_interval});"
                    " widen bucket_width, filter outlier intervals, or raise the cap"
                ),
            )
        )
    )
    iv = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_ij_bucket", F.explode(guarded)
    )
    pt = points.withColumn("_ij_bucket", F.floor(F.col(point_col) / width).cast("long"))
    return (
        iv.join(pt, ["_ij_bucket", *extra], "inner")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
        .drop("_ij_bucket")
    )
