"""Skew mitigation: salted joins and two-phase aggregation.

The reference never needed these — Postgres on one node has no shuffle —
but at the 100 TB design point a handful of hot keys (a dominant lineage
in the mutation tables, one country holding half the sequences) turn a
shuffle join or groupBy into a single straggler task. AQE's skew-join
splitting covers sort-merge joins when statistics surface the skew; these
helpers are the explicit, deterministic fallback for the cases AQE cannot
rewrite (e.g. the build side must be replicated, or the skew appears in an
aggregation rather than a join).

Semantics contract: each helper provably returns the same rows as its
naive counterpart — tests assert equality against the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    *,
    how: str = "inner",
    num_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed``'s join keys are hot.

    Each skewed row gets a random salt in [0, num_salts); ``other`` is
    replicated once per salt value (explode of a literal range — a
    num_salts× blowup of the SMALL side only). The join key becomes
    (keys..., salt), so a hot key's rows spread across ``num_salts``
    shuffle partitions instead of one straggler.

    ``how`` may be 'inner' or 'left' (left = keep unmatched skewed rows;
    replicating the other side never duplicates matches because each
    skewed row carries exactly one salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if SALT_COL in skewed.columns or SALT_COL in other.columns:
        raise ValueError(f"{SALT_COL} column already present")
    salted = skewed.withColumn(SALT_COL, (F.rand(seed) * num_salts).cast("int"))
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted.join(replicated, [*on, SALT_COL], how).drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial: dict[str, Column],
    final: dict[str, Column],
    *,
    num_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-phase groupBy for algebraic aggregates on skewed keys.

    Phase 1 groups by (keys..., salt) — hot keys split across tasks;
    phase 2 re-aggregates the ≤ num_salts partial rows per key. ``partial``
    maps intermediate column names to phase-1 expressions over ``df``'s
    columns; ``final`` maps output names to phase-2 expressions over the
    intermediate names, e.g.::

        partial={"s": F.sum("x"), "c": F.count(F.lit(1))},
        final={"total": F.sum("s"), "n": F.sum("c")}

    Spark's own hash aggregate already does map-side partial aggregation,
    so this helper matters when the *reduce* side is the bottleneck —
    non-trivially-combinable states (collect_list/set on hot keys) or when
    the per-key state is large enough that one reducer spills.
    """
    if SALT_COL in df.columns:
        raise ValueError(f"{SALT_COL} column already present")
    phase1 = (
        df.withColumn(SALT_COL, (F.rand(seed) * num_salts).cast("int"))
        .groupBy(*keys, SALT_COL)
        .agg(*[expr.alias(name) for name, expr in partial.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final.items()]
    )


def salted_count_distinct(
    df: DataFrame, keys: list[str], value: str, *, num_salts: int = 8
) -> DataFrame:
    """count(DISTINCT value) per key without one reducer holding a hot
    key's whole distinct set: dedupe on (keys, value) first — the salt is
    the value itself, which is exactly what distinct needs — then count.
    NULL values are excluded (count(value) skips them) but keys whose
    values are all NULL still appear with 0, matching
    ``count(DISTINCT value)`` over a groupBy exactly.
    Output column: ``n_distinct``."""
    return (
        df.select(*keys, value)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(value)).alias("n_distinct"))
    )
