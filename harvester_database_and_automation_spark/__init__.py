"""PySpark-native analytics engine with the query and data-processing
capabilities of cevo-public/harvester-database-and-automation.

Brand-new, Spark-first implementation (DataFrame / SQL / Catalyst /
Structured Streaming). The reference (read-only at /root/reference/) defines
WHAT is computed — the operator repertoire, query semantics, and data model
surveyed in SURVEY.md — not how. Nothing here is a port of its
C++/R/Java/Python execution code.

Layout:
    session     SparkSession factory tuned for local[N] and cluster use
    catalog     typed loaders for the synthetic test corpus
    operators/  relational operator library (joins, dedup, aggregates, ids,
                set ops, merge/write-path)
    functions/  scalar helpers + domain compute kernels (K1-K10)
    sources/    file-format readers/writers (FASTA, CSV/TSV, JSON-lines)
    plans/      the query registry: named queries + DuckDB oracle SQL
    streaming/  incremental / poll-loop replacements (Trigger.AvailableNow)
    llm/        training-data pipeline ops: dedup, similarity, text analysis,
                multimodal column plumbing
"""

__version__ = "0.1.0"
