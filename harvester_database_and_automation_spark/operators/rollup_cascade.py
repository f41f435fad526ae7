"""Hypertable-style cascade rollup — multi-resolution time-bucketed
aggregates where each coarser level re-aggregates the level below it, not
the raw fact table.

TimescaleDB's continuous aggregates (and every time-series store's rollup
tree) keep minute/hour/day materializations of the same measures. The
Spark-scale property this module encodes: only the FINEST level scans the
events; every coarser level aggregates the (already tiny) finer rollup, so
a day-level refresh over a year of data touches ~525k minute rows instead
of the raw 100 TB. That requires the measures to be decomposable —
sum/count/min/max re-aggregate exactly; avg is carried as (sum, count) and
finalized at read time.

Incremental maintenance composes with ``operators/publish.py``: each level
is a derived table partitioned by its bucket, and a late-arriving batch
dirties only the buckets it touches at each level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit -> the next-coarser unit each level folds into
_UNITS = ["minute", "hour", "day", "week", "month"]


def _trunc_ntz(unit: str, col) -> F.Column:
    # date_trunc promotes NTZ to LTZ through the session zone; casting back
    # restores the wall-clock value (same helper as plans/relational.py).
    return F.date_trunc(unit, col).cast("timestamp_ntz")


def cascade_rollup(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    levels: list[str],
) -> dict[str, DataFrame]:
    """Return {level_unit: rollup DataFrame} for ascending ``levels`` (each
    must be coarser than the last, drawn from minute/hour/day/week/month).

    Every level has schema (bucket, *keys, n_events, value_sum, value_min,
    value_max) — decomposable measures only, so level i+1 is an exact
    re-aggregation of level i.
    """
    order = [u for u in _UNITS if u in levels]
    if order != levels or not levels:
        raise ValueError(f"levels must be ascending from {_UNITS}, got {levels}")

    out: dict[str, DataFrame] = {}
    finest = levels[0]
    base = events.groupBy(
        _trunc_ntz(finest, ts_col).alias("bucket"), *[F.col(k) for k in keys]
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("value_sum"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
    )
    out[finest] = base

    prev = base
    for unit in levels[1:]:
        prev = prev.groupBy(
            _trunc_ntz(unit, "bucket").alias("bucket"), *[F.col(k) for k in keys]
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
        out[unit] = prev
    return out
