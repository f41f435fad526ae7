"""Argmin/best-per-group dedup — the single most reused pattern in the
reference's analytic SQL (not-exists argmin at
database/sql/spectrum/sequences_gisaid_api_based.sql:60-78, tie-break by
name at database/sql/consensus_sequence.sql:295-305, R duplicate_idx at
database/R/export_spsp_submission.R:244-273)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "_rn"


def keep_best(
    df: DataFrame, partition_cols: Sequence[str], order_cols: Sequence[Column | str]
) -> DataFrame:
    """Keep exactly one row per partition: the first under ``order_cols``.

    Tie-breaks MUST be fully deterministic (include a unique column last)
    to reproduce the reference's bit-for-bit dedup choices — the SURVEY §7
    risk register item.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)
