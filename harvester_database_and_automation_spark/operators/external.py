"""S8 — external-process map stage (SURVEY.md §2.1).

The reference shells out to mafft/nextclade/pangolin over FASTA batches
(gisaid/BatchProcessingWorker.java:339-440, automation/gisaid_importer/
align_splits.sh:14-45) with its own worker pool and a 20-minute timeout,
and it TOLERATES per-batch tool failures: a failed batch is reported and
skipped, the run aborts only when >=5% of all rows failed
(GisaidApiImporter.java:389-410, gate at :392-393).

Spark-first: the worker pool IS partition parallelism. Each partition
writes its rows as FASTA to the subprocess's stdin, reads the tool's
stdout back, and re-joins results by sequence name. Two failure modes:

- ``on_error="fail"`` (default): one process per partition; a tool error
  fails the task, so Spark's retry machinery applies (transient-infra
  semantics).
- ``on_error="quarantine"``: the partition is processed in batches of
  ``batch_size`` (the reference batched 500 sequences); a failing batch
  quarantines its input rows — each yielded with NULL output fields, its
  input name in ``_tool_input_name`` and the error in ``_tool_error`` —
  and the stage CONTINUES (poison-row semantics: one bad sequence costs
  its batch, never the stage). The pipeline-level <5% gate lives in
  ``pipelines/feed_import.py`` (FeedImportReport.ok), which recognizes
  the ``_tool_error`` marker column.

Tests use a stub command (sed/awk) standing in for the real binary — the
same seam the reference uses, where the tool's CSV output is the contract
(BatchProcessingWorker.java:396-440).
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, Row
from pyspark.sql import types as T

DEFAULT_TIMEOUT_S = 20 * 60  # the reference's mafft timeout
DEFAULT_BATCH_SIZE = 500  # the reference's FASTA batch size
TOOL_ERROR_COL = "_tool_error"
TOOL_INPUT_NAME_COL = "_tool_input_name"


def _run_batch(
    command: list[str],
    batch: Sequence[Row],
    name_col: str,
    seq_col: str,
    timeout_s: int,
) -> str:
    fasta = "".join(f">{row[name_col]}\n{row[seq_col]}\n" for row in batch)
    proc = subprocess.run(
        command, input=fasta, capture_output=True, text=True, timeout=timeout_s
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"external tool {command[0]!r} failed rc={proc.returncode}: "
            f"{proc.stderr[:500]}"
        )
    return proc.stdout


def run_fasta_tool(
    df: DataFrame,
    command: list[str],
    output_schema: T.StructType | str,
    parse_line,
    name_col: str = "name",
    seq_col: str = "sequence",
    timeout_s: int = DEFAULT_TIMEOUT_S,
    on_error: str = "fail",
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> DataFrame:
    """Pipe (name, sequence) rows through ``command`` partition-wise.

    The tool receives FASTA on stdin and must write line-oriented output on
    stdout; ``parse_line(line) -> Row | None`` maps each output line to a
    row of ``output_schema`` (None skips, e.g. headers). The stage is a
    mapPartitions: no shuffle, parallelism = input partitions, so size
    partitions to the tool's sweet spot with ``df.repartition(n)`` before
    calling.

    ``on_error="quarantine"`` appends two marker columns to the schema —
    ``_tool_input_name`` / ``_tool_error``, NULL on success rows — and
    converts a failing ``batch_size``-row batch into quarantine rows
    instead of a task failure (module docstring; the reference's per-batch
    tolerance + report merge, GisaidApiImporter.java:389-410).
    """
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be 'fail' or 'quarantine', got {on_error!r}")
    schema = (
        output_schema
        if isinstance(output_schema, T.StructType)
        else T._parse_datatype_string(output_schema)
    )
    quarantine = on_error == "quarantine"
    if quarantine:
        out_schema = T.StructType(
            schema.fields
            + [
                T.StructField(TOOL_INPUT_NAME_COL, T.StringType()),
                T.StructField(TOOL_ERROR_COL, T.StringType()),
            ]
        )
    else:
        out_schema = schema
    fields = [f.name for f in out_schema.fields]
    base_fields = [f.name for f in schema.fields]

    def _run(partition: Iterator[Row]) -> Iterator[Row]:
        rows = list(partition)
        if not rows:
            return
        if not quarantine:
            stdout = _run_batch(command, rows, name_col, seq_col, timeout_s)
            for line in stdout.splitlines():
                parsed = parse_line(line)
                if parsed is not None:
                    yield Row(**dict(zip(fields, parsed)))
            return
        for start in range(0, len(rows), batch_size):
            batch = rows[start : start + batch_size]
            try:
                stdout = _run_batch(command, batch, name_col, seq_col, timeout_s)
            except (RuntimeError, subprocess.TimeoutExpired, OSError) as exc:
                err = f"{type(exc).__name__}: {exc}"[:500]
                for row in batch:
                    yield Row(
                        **dict(zip(base_fields, [None] * len(base_fields))),
                        **{
                            TOOL_INPUT_NAME_COL: str(row[name_col]),
                            TOOL_ERROR_COL: err,
                        },
                    )
                continue
            for line in stdout.splitlines():
                parsed = parse_line(line)
                if parsed is not None:
                    yield Row(
                        **dict(zip(base_fields, parsed)),
                        **{TOOL_INPUT_NAME_COL: None, TOOL_ERROR_COL: None},
                    )

    return df.rdd.mapPartitions(_run).toDF(out_schema)
