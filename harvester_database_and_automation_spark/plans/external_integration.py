"""External-process integration (S8) as driver-checkable queries.

The per-partition subprocess map (`operators/external.py`) mirrors the
reference's batch tool workers; the query here pushes real data through
a real subprocess and hash-compares against a relational oracle, so the
protocol (FASTA framing, partition batching, stdout parsing) carries
driver-green evidence, not just unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.plans.registry import register


@register(
    "external_tool_seq_stats",
    survey_ref="S8,external-map",
    oracle="""
WITH c AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z]', '', 'g') AS seq FROM documents
)
SELECT doc_id,
       CAST(length(seq) AS INT) AS seq_len,
       CAST(length(seq) - length(replace(seq, 'a', '')) AS INT) AS n_a
FROM c
""",
)
def external_tool_seq_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The external-process map (S8), driver-hash-certified: pipe every
    document through a real subprocess (`operators/external.run_fasta_tool`
    — per-partition FASTA on stdin, line-oriented stdout, the protocol of
    the reference's batch tool workers, BatchProcessingWorker.java:339-440)
    and have the tool (awk) report per-sequence length and 'a'-count; the
    relational oracle recomputes both, so the hash certifies the FASTA
    framing, the partition batching, and the stdout parse — not just the
    arithmetic. Text is canonicalized to [a-z] so records are one line
    each and FASTA-safe.

    Scale shape: mapPartitions, no shuffle; parallelism = input splits,
    one subprocess per partition (the fanout repartition sizes batches
    to the tool's sweet spot, as the reference batched 500 sequences)."""
    from pyspark.sql import Row

    from harvester_database_and_automation_spark.operators.external import run_fasta_tool
    from harvester_database_and_automation_spark.plans.shared import fanout

    docs = fanout(
        load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("string").alias("name"),
            F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "").alias("sequence"),
        )
    )
    awk = (
        'NR%2==1{n=substr($0,2)} NR%2==0{c=gsub(/a/,"a"); print n"\\t"length($0)"\\t"c}'
    )

    def parse_line(line: str):
        parts = line.split("\t")
        if len(parts) != 3:
            return None
        return Row(doc_id=int(parts[0]), seq_len=int(parts[1]), n_a=int(parts[2]))

    return run_fasta_tool(
        docs,
        ["awk", awk],
        "doc_id long, seq_len int, n_a int",
        parse_line,
    )
