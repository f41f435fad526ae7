"""Reusable genomics column functions (pure Spark expressions, no UDFs).

Shared by the kernel queries in plans/kernels.py and property-tested in
tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def has_frameshift(gaps: Column | str) -> Column:
    """K5 — a gaps string ``"a-b,c-d"`` has a frameshift iff any gap length
    (b-a) is not a multiple of 3 (database/R/utility.R:264-300). Null/empty
    gap strings mean no gaps -> no frameshift."""
    col = F.col(gaps) if isinstance(gaps, str) else gaps
    shifted = F.exists(
        F.split(col, ","),
        lambda g: (
            F.split_part(g, F.lit("-"), F.lit(2)).cast("int")
            - F.split_part(g, F.lit("-"), F.lit(1)).cast("int")
        )
        % 3
        != 0,
    )
    return F.when(col.isNull() | (col == ""), F.lit(False)).otherwise(shifted)


def hamming(a: Column | str, b: Column | str, width: int) -> Column:
    """A11 — Hamming distance over the first ``width`` characters of two
    equal-length strings, as a higher-order count (utility.R:306-313)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(width)),
            lambda i: ca.substr(i, F.lit(1)) != cb.substr(i, F.lit(1)),
        )
    )


def pseudo_sequence(text: Column | str) -> Column:
    """The deterministic pseudo-genome used by the kernel queries: the
    document's acgt letters, uppercased."""
    col = F.col(text) if isinstance(text, str) else text
    return F.upper(F.regexp_replace(col, "[^acgt]", ""))
