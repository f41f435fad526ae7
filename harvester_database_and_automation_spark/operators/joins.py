"""Join helpers beyond plain equi-joins (SURVEY.md §2.3 J9).

``coalesce_join`` reproduces the R helper at database/R/utility.R:324-357:
a left join where every column present on BOTH sides is collapsed to
``coalesce(left, right)`` — the existing value wins, the joined value
fills gaps. The reference uses it to enrich test metadata from multiple
lab feeds without clobbering already-known fields.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coalesce_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    how: str = "left",
    prefer: str = "left",
) -> DataFrame:
    """Join and coalesce overlapping non-key columns into one column each.

    Output schema = left's columns plus right's non-overlapping columns,
    in that order. ``prefer`` picks which side wins when both are non-null
    ('left' matches the R helper's default).
    """
    if prefer not in ("left", "right"):
        raise ValueError(f"prefer must be left/right, got {prefer!r}")
    overlap = [c for c in left.columns if c in right.columns and c not in on]
    right_only = [c for c in right.columns if c not in left.columns and c not in on]
    lhs, rhs = left.alias("l"), right.alias("r")
    joined = lhs.join(rhs, on=list(on), how=how)
    first, second = ("l", "r") if prefer == "left" else ("r", "l")
    return joined.select(
        *[F.col(k) for k in on],
        *[
            F.coalesce(F.col(f"{first}.{c}"), F.col(f"{second}.{c}")).alias(c)
            if c in overlap
            else F.col(f"l.{c}")
            for c in left.columns
            if c not in on
        ],
        *[F.col(f"r.{c}") for c in right_only],
    )
