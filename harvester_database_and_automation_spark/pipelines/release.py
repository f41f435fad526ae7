"""The release rule-cascade — the Spark re-design of the SPSP submission
pipeline's core (SURVEY.md §3.2; database/R/export_spsp_submission.R:
142-375).

One DAG: per-key window dedup (duplicate_idx), a single when-cascade that
assigns exactly ONE release/fail reason per row (first matching rule
wins, as case_when does), and the per-batch QC rollup with frac_batch —
the aggregate-of-aggregate share (export_spsp_submission.R:308-329).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

REASON_RELEASE = "release"


def build_release_plan(
    df: DataFrame,
    key_col: str,
    quality_col: str,
    batch_col: str,
    rules: list[tuple[str, Column]],
    tiebreak_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Annotate rows with (duplicate_idx, reason) and build the QC report.

    ``rules`` is an ordered list of (fail_reason, predicate) — the first
    predicate that holds names the reason; rows matching none release.
    The duplicate_idx window (best quality first, deterministic tie-break)
    is available to the rules, so "is a worse duplicate" is itself a rule.

    Returns (annotated, report): annotated carries every input column plus
    duplicate_idx and reason; report aggregates count and frac_batch per
    (batch, reason).
    """
    order = [F.col(quality_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    annotated = df.withColumn("duplicate_idx", F.row_number().over(w))

    reason: Column = F.lit(REASON_RELEASE)
    for name, predicate in reversed(rules):
        reason = F.when(predicate, name).otherwise(reason)
    annotated = annotated.withColumn("reason", reason)

    batch_totals = Window.partitionBy(batch_col)
    report = (
        annotated.groupBy(batch_col, "reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("frac_batch", F.col("n") / F.sum("n").over(batch_totals))
    )
    return annotated, report


def suspicious_batches(report: DataFrame, batch_col: str, threshold: float = 0.8) -> DataFrame:
    """Batches releasing less than ``threshold`` of their rows — the
    reference's <80% alert (export_spsp_submission.R:335-375)."""
    released = report.filter(F.col("reason") == REASON_RELEASE)
    return (
        report.groupBy(batch_col)
        .agg(F.sum("n").alias("n_total"))
        .join(released.select(batch_col, F.col("n").alias("n_released")), batch_col, "left")
        .fillna(0, ["n_released"])
        .withColumn("release_rate", F.col("n_released") / F.col("n_total"))
        .filter(F.col("release_rate") < threshold)
    )


def resequencing_decisions(
    released: DataFrame,
    incoming: DataFrame,
    key: str,
    n_col: str,
    ratio: float = 0.9,
) -> DataFrame:
    """Resequencing gate (database/R/export_spsp_submission.R:427-516,
    acceptance rule at :476): a re-sequenced sample is submitted as an
    update only when its quality metric (consensus N-count — lower is
    better) improves on the best already-released attempt by at least
    ``1 - ratio`` (default ≥10%, i.e. ``new < 0.9 * best_old``); otherwise
    it is tombstoned into notes. Samples never released submit as new.

    Adds a ``decision`` column ∈ {submit_new, submit_update, tombstone};
    one broadcast-size aggregation of the released side, no payloads
    shuffled.
    """
    best = released.groupBy(key).agg(F.min(n_col).alias("_best_n"))
    out = incoming.join(best, key, "left")
    decision = (
        F.when(F.col("_best_n").isNull(), "submit_new")
        .when(F.col(n_col) < ratio * F.col("_best_n"), "submit_update")
        .otherwise("tombstone")
    )
    return out.withColumn("decision", decision).drop("_best_n")


def batch_completeness(
    expected: DataFrame,
    arrived: DataFrame,
    key: str,
    batch_col: str,
) -> DataFrame:
    """Batch-completeness reconciliation (database/R/utility.R:1107-1144):
    the release pipeline only ships batches whose expected sample list (the
    V-pipe sampleset) fully arrived. Per batch: expected/arrived/missing
    counts plus is_complete — missing keys come from one left-anti join of
    the expected list against arrivals."""
    exp_counts = expected.groupBy(batch_col).agg(F.count(F.lit(1)).alias("n_expected"))
    missing = expected.join(arrived.select(key), key, "left_anti")
    miss_counts = missing.groupBy(batch_col).agg(F.count(F.lit(1)).alias("n_missing"))
    return (
        exp_counts.join(miss_counts, batch_col, "left")
        .select(
            batch_col,
            "n_expected",
            F.coalesce("n_missing", F.lit(0)).alias("n_missing"),
        )
        .withColumn("n_arrived", F.col("n_expected") - F.col("n_missing"))
        .withColumn("is_complete", F.col("n_missing") == 0)
    )
