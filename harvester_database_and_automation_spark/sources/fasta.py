"""S3 — FASTA reader/writer (SURVEY.md §2.1).

The reference parses ``>header\\nseq`` blocks imperatively
(gisaid/BatchProcessingWorker.java:300-336, database/R/utility.R:381-486)
and formats FASTA in SQL (database/sql/consensus_sequence.sql:314-318).

Spark-first design: a FASTA record is everything between ``>`` markers, so
reading with ``lineSep='>'`` turns each record into ONE text row regardless
of how many lines the sequence wraps over — no stateful cross-line parsing,
fully splittable across executors for multi-file inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Read FASTA file(s) into (name, description, sequence).

    ``name`` is the header token up to the first whitespace, ``description``
    the remainder (empty string if none). Sequence lines are concatenated
    and uppercased is NOT applied — bases are returned verbatim, matching
    the reference's reader.
    """
    raw = spark.read.option("lineSep", ">").text(path)
    # Normalize CRLF before any header parsing: trim() strips spaces only,
    # so a Windows-format file would otherwise leave '\r' glued onto
    # name/description (invisible when printed, fatal in joins).
    rec = raw.select(F.regexp_replace(F.col("value"), "\r", "").alias("rec")).filter(
        F.trim("rec") != ""
    )
    header = F.substring_index("rec", "\n", 1)
    body = F.expr("substr(rec, length(substring_index(rec, '\\n', 1)) + 2)")
    return rec.select(
        F.trim(F.substring_index(header, " ", 1)).alias("name"),
        F.trim(
            F.when(header.contains(" "), F.expr("substr(substring_index(rec, '\\n', 1), instr(substring_index(rec, '\\n', 1), ' ') + 1)")).otherwise("")
        ).alias("description"),
        F.regexp_replace(body, r"\s", "").alias("sequence"),
    ).filter(F.col("name") != "")


def write_fasta(
    df: DataFrame,
    path: str,
    name_col: str = "name",
    seq_col: str = "sequence",
    wrap: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write (name, sequence) rows as FASTA text files.

    ``wrap`` re-wraps sequences at a fixed line width (the reference emits
    both wrapped and unwrapped forms). ``max_records_per_file`` maps to the
    chunked-export contract (pangolin_lineage_exporter.py MAX_LINES_PER_FILE)
    via Spark's maxRecordsPerFile instead of a driver-side loop.
    """
    seq = F.col(seq_col)
    if wrap is not None:
        # Split into fixed-width chunks and re-join with newlines — pure
        # built-ins (regexp on (.{1,wrap}) would drop newlines in codegen).
        seq = F.array_join(
            F.transform(
                F.sequence(F.lit(0), ((F.length(seq) - 1) / wrap).cast("int")),
                lambda i: F.substring(seq, (i * wrap + 1).cast("int"), wrap),
            ),
            "\n",
        )
    out = df.select(F.concat(F.lit(">"), F.col(name_col), F.lit("\n"), seq).alias("value"))
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.text(path)
