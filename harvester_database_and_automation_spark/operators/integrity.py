"""Referential-integrity and uniqueness checks.

Spark enforces no PRIMARY KEY / FOREIGN KEY constraints, so the
reference's declarative guarantees become procedural checks (SURVEY.md
§1.2): composite PKs (init.sql:246, :523, :569) → uniqueness assertions;
FKs with cascade (init.sql:258-259, :341-342) → anti-join orphan scans;
the R importers' hard-stop duplicate checks
(database/R/export_spsp_submission.R qc_sample_metadata) → the same
assertions promoted to pipeline gates.

Both checks return the VIOLATING rows (not booleans) so callers can
quarantine, alert, or hard-stop with evidence — the reference's pattern of
emailing the offending sample list. Each is a single shuffle: a hash
aggregation for duplicates, a left-anti hash join for orphans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``keys`` appearing more than once, with their multiplicity —
    the composite-PK uniqueness assertion. Empty result = constraint holds."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def orphans(
    child: DataFrame,
    parent: DataFrame,
    fk: Sequence[str] | dict[str, str],
    ignore_null_fk: bool = True,
) -> DataFrame:
    """Child rows whose foreign key has no matching parent row — the
    FK-constraint scan. ``fk`` is a column list (same names both sides) or
    a {child_col: parent_col} mapping. SQL FK semantics ignore NULL keys;
    pass ``ignore_null_fk=False`` to report them instead."""
    mapping = {c: c for c in fk} if not isinstance(fk, dict) else dict(fk)
    cond = [child[c] == parent[p] for c, p in mapping.items()]
    out = child.join(parent, cond, "left_anti")
    if ignore_null_fk:
        for c in mapping:
            out = out.filter(child[c].isNotNull())
    return out
