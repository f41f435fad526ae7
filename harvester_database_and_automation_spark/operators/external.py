"""S8 — external-process map stage (SURVEY.md §2.1).

The reference shells out to mafft/nextclade/pangolin over FASTA batches
(gisaid/BatchProcessingWorker.java:339-440, automation/gisaid_importer/
align_splits.sh:14-45) with its own worker pool and a 20-minute timeout.

Spark-first: the worker pool IS partition parallelism. Each partition
writes its rows as FASTA to the subprocess's stdin, reads the tool's
stdout back, and re-joins results by sequence name — one process per
partition (not per row), timeout enforced per partition, tool failures
surface as task failures so Spark's retry machinery applies.

Tests use a stub command (sed/awk) standing in for the real binary — the
same seam the reference uses, where the tool's CSV output is the contract
(BatchProcessingWorker.java:396-440).
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import types as T

DEFAULT_TIMEOUT_S = 20 * 60  # the reference's mafft timeout


def run_fasta_tool(
    df: DataFrame,
    command: list[str],
    output_schema: T.StructType | str,
    parse_line,
    name_col: str = "name",
    seq_col: str = "sequence",
    timeout_s: int = DEFAULT_TIMEOUT_S,
) -> DataFrame:
    """Pipe (name, sequence) rows through ``command`` partition-wise.

    The tool receives FASTA on stdin and must write line-oriented output on
    stdout; ``parse_line(line) -> Row | None`` maps each output line to a
    row of ``output_schema`` (None skips, e.g. headers). The stage is a
    mapPartitions: no shuffle, parallelism = input partitions, so size
    partitions to the tool's sweet spot (the reference used batches of 500
    sequences) with ``df.repartition(n)`` before calling.
    """
    schema = (
        output_schema
        if isinstance(output_schema, T.StructType)
        else T._parse_datatype_string(output_schema)
    )
    fields = [f.name for f in schema.fields]

    def _run(partition: Iterator[Row]) -> Iterator[Row]:
        fasta_chunks = []
        for row in partition:
            fasta_chunks.append(f">{row[name_col]}\n{row[seq_col]}\n")
        if not fasta_chunks:
            return
        proc = subprocess.run(
            command,
            input="".join(fasta_chunks),
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"external tool {command[0]!r} failed rc={proc.returncode}: "
                f"{proc.stderr[:500]}"
            )
        for line in proc.stdout.splitlines():
            parsed = parse_line(line)
            if parsed is not None:
                yield Row(**dict(zip(fields, parsed)))

    return df.rdd.mapPartitions(_run).toDF(schema)
