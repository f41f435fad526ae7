"""Fuzzy (edit-distance) join without all-pairs comparison.

The reference resolves noisy name variants by exact alias tables
(pangolineage/PangolinLineageAliasImporter.java:47-64) and hand-curated
recode maps; a fuzzy join generalizes that to unanticipated typos. The
naive plan — ``levenshtein(a, b) <= d`` as a join condition — is a
nested loop over |L|·|R| string comparisons.

The scalable exact formulation for d=1 is the deletion-neighborhood
(SymSpell) join: every string's candidate key set is itself plus each
single-character deletion (|s|+1 keys). Two strings within edit distance
1 ALWAYS share a key:

- equal           -> share the string itself
- t = delete(s,i) -> t is in s's neighborhood
- t = insert(s)   -> s is in t's neighborhood
- t = subst(s,i)  -> delete(s,i) == delete(t,i)

so an equi-join on the exploded neighborhoods finds every true pair
(post-filtered by exact ``F.levenshtein``, JVM-side) and the cost tracks
key collisions, never |L|·|R|. Larger d generalizes via d-fold deletion
neighborhoods (size O(|s|^d)) — not needed by any reference workload, so
only d=1 ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del1(s: F.Column) -> F.Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )


def _del2(s: F.Column) -> F.Column:
    # delete positions i < j in one pass: three-substring concat. The inner
    # CASE guards j > i (a bare sequence(i+1, L) would flip descending when
    # i = L and explode the wrong variants).
    L = F.length(s)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.transform(
                F.sequence(F.lit(1), L),
                lambda j: F.when(
                    j > i,
                    F.concat(
                        s.substr(F.lit(1), i - 1),
                        s.substr(i + 1, j - i - 1),
                        s.substr(j + 1, L),
                    ),
                ),
            ),
        )
    )
    return F.filter(pairs, lambda v: v.isNotNull())


def _deletion_neighborhood(col: str, max_dist: int) -> F.Column:
    s = F.col(col)
    parts = F.concat(F.array(s), _del1(s))
    if max_dist >= 2:
        parts = F.concat(parts, _del2(s))
    return F.array_distinct(parts)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Inner-join rows with ``levenshtein(left_col, right_col) <=
    max_dist`` (1 or 2). Column names must be disjoint. Output: all left +
    right columns plus ``dist``. Each qualifying pair appears exactly once.

    d=2 uses two-fold deletion neighborhoods (O(|s|²) keys per row — still
    collision-driven, never |L|·|R|); the exact post-filter keeps the
    result identical to the naive predicate either way.
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    reserved = {"_fz_key", "_fz_lid", "_fz_rid"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(f"rename columns clashing with fuzzy_join internals: {sorted(taken)}")
    l = left.withColumn("_fz_lid", F.monotonically_increasing_id()).withColumn(
        "_fz_key", F.explode(_deletion_neighborhood(left_col, max_dist))
    )
    r = right.withColumn("_fz_rid", F.monotonically_increasing_id()).withColumn(
        "_fz_key", F.explode(_deletion_neighborhood(right_col, max_dist))
    )
    return (
        l.join(r, "_fz_key")
        .drop("_fz_key")
        # a ROW pair can collide on several keys; emit once per pair of
        # input rows (value-level distinct would collapse duplicate rows
        # and diverge from the naive join)
        .dropDuplicates(["_fz_lid", "_fz_rid"])
        .drop("_fz_lid", "_fz_rid")
        .withColumn("dist", F.levenshtein(left_col, right_col).cast("int"))
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_join_dist1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """``fuzzy_join`` at the d=1 the reference's alias workloads need."""
    return fuzzy_join(left, right, left_col, right_col, max_dist=1)
