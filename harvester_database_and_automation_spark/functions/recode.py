"""Recode/lookup helpers (SURVEY.md §2.8 lookup family, §2.2 P4).

Age-group binning (init.sql:787-867 dashboard view), enum code->label
maps (import_bag_meldeformular.R:26-92), and the R coalesce_join
(utility.R:324-357).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def age_group(col: Column | str, width: int = 10, top: int = 80) -> Column:
    """Bin an age into '0-9', '10-19', ..., '80+' (the dashboard binning).
    Null ages -> 'Unknown'."""
    c = F.col(col) if isinstance(col, str) else col
    lo = (F.floor(c / width) * width).cast("int")
    return (
        F.when(c.isNull(), "Unknown")
        .when(c >= top, f"{top}+")
        .otherwise(F.concat(lo.cast("string"), F.lit("-"), (lo + width - 1).cast("string")))
    )


def recode_map(col: Column | str, mapping: dict, default: Column | str | None = None) -> Column:
    """Enum code -> label via a literal CASE chain (small maps; for large
    maps broadcast-join a dim table instead — SURVEY §2.8 lookup row)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        expr = F.when(c == k, v) if expr is None else expr.when(c == k, v)
    if expr is None:
        raise ValueError("empty mapping")
    return expr.otherwise(default if default is not None else F.lit(None))


def coalesce_join(
    left: DataFrame, right: DataFrame, on: Sequence[str], how: str = "left"
) -> DataFrame:
    """Dplyr-style coalesce_join (utility.R:324-357). Canonical
    implementation lives in operators.joins (adds a ``prefer`` side);
    re-exported here for the recode/enrichment call sites."""
    from harvester_database_and_automation_spark.operators.joins import (
        coalesce_join as _cj,
    )

    return _cj(left, right, on, how=how)
