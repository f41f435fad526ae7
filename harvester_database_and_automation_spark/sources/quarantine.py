"""P6 — row-content validation with quarantine (SURVEY.md §2.2).

The reference enforces enum domains, required columns, uniqueness, and
date-range sanity at import time (database/R/utility.R:755-814, 933-955;
database/python/viollier/parser.py:84-131), rejecting offending rows.

Spark-first: each check is a named boolean Column; one pass annotates every
row with the array of failed check names, then the stream splits into a
clean DataFrame and a quarantine DataFrame carrying the reasons — no UDFs,
single scan, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAILED_COL = "_failed_checks"


def validate(df: DataFrame, checks: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (good, quarantined) by the given named checks.

    ``checks`` maps check-name -> Column predicate that is True when the row
    PASSES. Null predicate results count as failures (e.g. ``col.rlike``
    on a null column). The quarantine output carries ``_failed_checks``:
    an array of the names that failed, for routing/reporting.
    """
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond.cast("boolean"), F.lit(False)), F.lit(name))
                for name, cond in checks.items()
            ]
        )
    )
    annotated = df.withColumn(FAILED_COL, failed)
    good = annotated.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    quarantined = annotated.filter(F.size(FAILED_COL) > 0)
    return good, quarantined


def enum_check(col: str, allowed: list[str]) -> Column:
    """Enum-domain check (nulls allowed — pair with not_null for required)."""
    return F.col(col).isNull() | F.col(col).isin(allowed)


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def date_between(col: str, lo: str, hi_col: Column | None = None) -> Column:
    """Date-range sanity: within [lo, hi] where hi defaults to today
    (utility.R:933-955 rejects dates outside [2020-02-24, now])."""
    hi = hi_col if hi_col is not None else F.current_date()
    return (F.col(col) >= F.lit(lo).cast("date")) & (F.col(col) <= hi)
