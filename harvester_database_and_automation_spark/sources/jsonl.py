"""S2 — JSON-lines reader with schema-drift detection (SURVEY.md §2.1).

The reference streams GISAID's provision.json.xz and aborts when required
fields disappear from the feed, warning when unexpected fields appear
(gisaid/GisaidApiImporter.java:165-223). Spark-first: read with an explicit
schema (never infer in production), and run the drift check as a set
comparison against a sampled inference — the same contract, two code paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with an explicit schema into (good, corrupt).

    Unparseable lines land in the corrupt DataFrame with the raw line
    preserved — the quarantine contract of SURVEY.md §2.2 P6. Compressed
    inputs (.gz/.xz where the codec is available) are handled by Spark's
    codec inference from the file extension.
    """
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(full)
        .json(path)
        .cache()  # one pass feeding two outputs; tiny metadata-only reuse
    )
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return good, corrupt


@dataclass
class DriftReport:
    missing_required: set[str] = field(default_factory=set)
    missing_expected: set[str] = field(default_factory=set)
    unexpected: set[str] = field(default_factory=set)

    @property
    def ok(self) -> bool:
        """Abort-worthy only when required fields vanished (the reference
        emails a warning for the other two cases and proceeds)."""
        return not self.missing_required


def check_field_drift(
    spark: SparkSession,
    path: str,
    required: set[str],
    expected: set[str] = frozenset(),
    sample_lines: int = 10,
) -> DriftReport:
    """Compare the fields present in the first ``sample_lines`` JSON lines
    against required/expected field sets (GisaidApiImporter.java:167-223)."""
    head = spark.read.text(path).limit(sample_lines)
    inferred = spark.read.json(head.rdd.map(lambda r: r.value))
    seen = {f for f in inferred.columns if f != CORRUPT_COL}
    return DriftReport(
        missing_required=required - seen,
        missing_expected=expected - seen,
        unexpected=seen - required - expected,
    )
