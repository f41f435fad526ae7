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

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_TIMEOUT_S = 20 * 60  # the reference's mafft timeout
DEFAULT_BATCH_SIZE = 500  # the reference's FASTA batch size
TOOL_ERROR_COL = "_tool_error"
TOOL_INPUT_NAME_COL = "_tool_input_name"


def _run_text(command: list[str], fasta: str, timeout_s: int) -> str:
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
    n_base = len(base_fields)

    # Arrow-batched partition map instead of the former
    # `df.rdd.mapPartitions(...).toDF(schema)`: the RDD path pickled every
    # input row into a Python Row, built a Row object per OUTPUT line, and
    # re-verified each row against the schema in toDF — all row-at-a-time
    # overhead the tool itself never needed. mapInPandas moves whole
    # column batches across the boundary once, and only the two columns
    # the tool reads cross at all (the .select below — an opaque map over
    # the full row set would defeat column pruning at the scan). The
    # partition's batches are CONCATENATED before the tool runs so the
    # subprocess contract is unchanged: fail mode still pipes the whole
    # partition through ONE process (record-INTERDEPENDENT tools like
    # aligners see the same input grouping as before), quarantine mode
    # still slices the partition into batch_size windows in row order.
    def _run(pdfs):
        import pandas as pd

        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        part = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        names = part[name_col].tolist()
        seqs = part[seq_col].tolist()

        def parse_all(stdout: str) -> list[tuple]:
            out = []
            for line in stdout.splitlines():
                parsed = parse_line(line)
                if parsed is not None:
                    out.append(tuple(parsed))
            return out

        records: list[tuple] = []
        if not quarantine:
            fasta = "".join(f">{n}\n{s}\n" for n, s in zip(names, seqs))
            records = parse_all(_run_text(command, fasta, timeout_s))
        else:
            for start in range(0, len(names), batch_size):
                b_names = names[start : start + batch_size]
                b_seqs = seqs[start : start + batch_size]
                fasta = "".join(f">{n}\n{s}\n" for n, s in zip(b_names, b_seqs))
                try:
                    stdout = _run_text(command, fasta, timeout_s)
                except (RuntimeError, subprocess.TimeoutExpired, OSError) as exc:
                    err = f"{type(exc).__name__}: {exc}"[:500]
                    records.extend(
                        (None,) * n_base + (str(n), err) for n in b_names
                    )
                    continue
                records.extend(t + (None, None) for t in parse_all(stdout))
        if records:
            # object dtype end-to-end: Arrow's from_pandas converts mixed
            # int/None columns to the declared nullable types exactly;
            # letting pandas infer would float-coerce quarantined int
            # columns.
            yield pd.DataFrame.from_records(records, columns=fields).astype(object)

    pruned = df.select(name_col, seq_col)
    return pruned.mapInPandas(_run, out_schema)
