"""S4 — typed CSV/TSV readers (SURVEY.md §2.1).

The reference reads ';'-delimited Nextclade/Viollier CSV and tab-separated
metadata with per-column coercion (BatchProcessingWorker.java:396-438,
database/R/import_nextclade.R:41-60, database/python/viollier/parser.py:
171-177). Spark-first: explicit schema, PERMISSIVE mode, corrupt rows
quarantined with the raw line preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = True,
    quote: str = '"',
    null_value: str | None = None,
    date_format: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a delimited file with a mandatory explicit schema into
    (good, corrupt). No schema inference, ever (SURVEY.md §1.3)."""
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("sep", sep)
        .option("header", header)
        .option("quote", quote)
        .option("enforceSchema", False)  # verify the header against the schema
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if date_format is not None:
        reader = reader.option("dateFormat", date_format)
    df = reader.schema(full).csv(path).cache()
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(df[CORRUPT_COL].isNotNull())
    return good, corrupt
