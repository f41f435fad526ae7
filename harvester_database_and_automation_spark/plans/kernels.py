"""Domain compute kernels (SURVEY.md §2.9) exercised as oracle-checked
queries. The genomics kernels operate on a deterministic pseudo-sequence
derived from each document (its ACGT letters), so the SAME algorithm the
reference runs on genomes is verified end-to-end against the SQL oracle on
the shared corpus. The reusable implementations live in
harvester_database_and_automation_spark/functions/kernels.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.plans.registry import register

# Pseudo-genome: the document's ACGT letters, uppercased (deterministic,
# same expression both engines).
_SEQ_SQL = "upper(regexp_replace(text, '[^acgt]', '', 'g'))"

# Inline variant definitions: (variant, 1-based position, expected base) —
# the variant_mutation_nucleotide shape (/root/reference/database/init.sql:477-483).
_VARIANT_DEFS = [
    ("ALPHA", 1, "A"),
    ("ALPHA", 2, "T"),
    ("ALPHA", 4, "G"),
    ("ALPHA", 6, "C"),
    ("ALPHA", 8, "T"),
    ("BETA", 1, "T"),
    ("BETA", 3, "A"),
    ("BETA", 5, "A"),
    ("BETA", 7, "G"),
    ("BETA", 9, "A"),
]
_VARIANT_VALUES_SQL = ", ".join(f"('{v}', {p}, '{b}')" for v, p, b in _VARIANT_DEFS)


@register(
    "k2_variant_caller",
    survey_ref="K2,J7,A2",
    oracle=f"""
WITH seqs AS (SELECT doc_id, {_SEQ_SQL} AS seq FROM documents),
defs AS (SELECT * FROM (VALUES {_VARIANT_VALUES_SQL}) AS v(variant, pos, base)),
calls AS (
  SELECT doc_id, variant,
         CAST(sum(CASE WHEN substr(seq, pos, 1) = base THEN 1 ELSE 0 END) AS BIGINT) AS n_confirmed,
         CAST(sum(CASE WHEN substr(seq, pos, 1) = '' THEN 1 ELSE 0 END) AS BIGINT)   AS n_unknown,
         count(*) AS n_sites
  FROM seqs CROSS JOIN defs
  GROUP BY doc_id, variant
)
SELECT variant,
       CAST(sum(CASE WHEN n_confirmed >= 0.8 * n_sites THEN 1 ELSE 0 END) AS BIGINT) AS n_called,
       CAST(sum(n_confirmed) AS BIGINT) AS total_confirmed,
       CAST(sum(n_unknown) AS BIGINT)   AS total_unknown
FROM calls
GROUP BY variant
""",
)
def k2_variant_caller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 — the 80%-rule SQL variant caller: classify each defining site by
    substr(seq, pos, 1), call the variant when confirmed sites reach 80% of
    the definition (database/sql/consensus_sequence.sql:21-72; GISAID
    version gisaid.sql:170-254). crossJoin(sequences, defs) + conditional
    agg, with the small definition table broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    seqs = docs.select(
        "doc_id", F.upper(F.regexp_replace("text", "[^acgt]", "")).alias("seq")
    )
    defs = spark.createDataFrame(_VARIANT_DEFS, "variant string, pos int, base string")
    site = F.substring(F.col("seq"), F.col("pos"), 1)
    calls = (
        seqs.crossJoin(F.broadcast(defs))
        .groupBy("doc_id", "variant")
        .agg(
            F.sum(F.when(site == F.col("base"), 1).otherwise(0)).cast("bigint").alias("n_confirmed"),
            F.sum(F.when(site == "", 1).otherwise(0)).cast("bigint").alias("n_unknown"),
            F.count(F.lit(1)).alias("n_sites"),
        )
    )
    return calls.groupBy("variant").agg(
        F.sum(F.when(F.col("n_confirmed") >= 0.8 * F.col("n_sites"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_called"),
        F.sum("n_confirmed").cast("bigint").alias("total_confirmed"),
        F.sum("n_unknown").cast("bigint").alias("total_unknown"),
    )


@register(
    "k5_frameshift_detector",
    survey_ref="K5",
    oracle="""
WITH gapped AS (
  SELECT doc_id,
         '0-' || (n_chars % 7) || ',' || (n_chars % 11) || '-' || (n_chars % 11 + n_chars % 5) AS gaps
  FROM documents
)
SELECT doc_id, gaps,
       len(list_filter(string_split(gaps, ','),
                       g -> (split_part(g, '-', 2)::INT - split_part(g, '-', 1)::INT) % 3 <> 0)) > 0
         AS has_frameshift
FROM gapped
""",
)
def k5_frameshift_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 — frameshift detector: a gaps string "a-b,c-d" has a frameshift
    iff any (b-a) % 3 != 0 (database/R/utility.R:264-300). Pure higher-order
    functions (split → exists), no UDF. The gaps strings are derived
    deterministically from n_chars so both engines see identical input."""
    docs = load_table(spark, sf_dir, "documents")
    gaps = F.concat_ws(
        "",
        F.lit("0-"),
        (F.col("n_chars") % 7).cast("string"),
        F.lit(","),
        (F.col("n_chars") % 11).cast("string"),
        F.lit("-"),
        (F.col("n_chars") % 11 + F.col("n_chars") % 5).cast("string"),
    )
    has_fs = F.exists(
        F.split(F.col("gaps"), ","),
        lambda g: (F.split_part(g, F.lit("-"), F.lit(2)).cast("int")
                   - F.split_part(g, F.lit("-"), F.lit(1)).cast("int")) % 3 != 0,
    )
    return docs.select("doc_id", gaps.alias("gaps")).select(
        "doc_id", "gaps", has_fs.alias("has_frameshift")
    )


@register(
    "k8_mention_miner",
    survey_ref="K8,J1",
    oracle="""
WITH vocab AS (SELECT * FROM (VALUES ('customer'), ('window'), ('column'), ('stream'), ('vector')) AS v(term)),
mentions AS (
  SELECT DISTINCT doc_id, word AS term
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]{6,}')) AS word FROM documents) t
)
SELECT m.term, count(*) AS n_docs
FROM mentions m JOIN vocab v ON m.term = v.term
GROUP BY m.term
""",
)
def k8_mention_miner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 — regex mention mining joined against a known vocabulary: extract
    candidate tokens, inner-join the dictionary, count mentioning docs
    (the pubmed lineage miner, database/sql/pubmed_init.sql:41-57)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = spark.createDataFrame(
        [("customer",), ("window",), ("column",), ("stream",), ("vector",)], "term string"
    )
    mentions = (
        docs.select(
            "doc_id", F.explode(F.expr("regexp_extract_all(text, '([a-z]{6,})', 1)")).alias("term")
        )
        .distinct()
    )
    return (
        mentions.join(F.broadcast(vocab), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "k9_condition_classifier",
    survey_ref="K9,P4",
    oracle="""
WITH flags AS (
  SELECT doc_id,
         CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS is_spark,
         CASE WHEN text LIKE '%stream%' THEN 1 ELSE 0 END AS is_stream,
         CASE WHEN text LIKE '%vector%' THEN 1 ELSE 0 END AS is_vector
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN is_spark + is_stream + is_vector > 1 THEN 'NO_UNIQUE_ASSIGNMENT'
         WHEN is_spark = 1  THEN 'SPARK'
         WHEN is_stream = 1 THEN 'STREAM'
         WHEN is_vector = 1 THEN 'VECTOR'
         ELSE 'UNCLASSIFIED'
       END AS condition
FROM flags
""",
)
def k9_condition_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 — rule-class classifier with ambiguity detection: each rule is a
    pattern flag; >1 matching rule → NO_UNIQUE_ASSIGNMENT
    (database/python/extract_sample_conditions.py:38-103)."""
    docs = load_table(spark, sf_dir, "documents")
    is_spark = F.when(F.col("text").like("%spark%"), 1).otherwise(0)
    is_stream = F.when(F.col("text").like("%stream%"), 1).otherwise(0)
    is_vector = F.when(F.col("text").like("%vector%"), 1).otherwise(0)
    flags = docs.select(
        "doc_id", is_spark.alias("is_spark"), is_stream.alias("is_stream"), is_vector.alias("is_vector")
    )
    condition = (
        F.when(F.col("is_spark") + F.col("is_stream") + F.col("is_vector") > 1, "NO_UNIQUE_ASSIGNMENT")
        .when(F.col("is_spark") == 1, "SPARK")
        .when(F.col("is_stream") == 1, "STREAM")
        .when(F.col("is_vector") == 1, "VECTOR")
        .otherwise("UNCLASSIFIED")
    )
    return flags.select("doc_id", condition.alias("condition"))


@register(
    "k10_base_frequency",
    survey_ref="K10,A1",
    oracle=f"""
SELECT base, count(*) AS n
FROM (SELECT unnest(regexp_extract_all({_SEQ_SQL}, '.')) AS base FROM documents) t
GROUP BY base
""",
)
def k10_base_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 — base-frequency profiler: per-character counts across all
    sequences (database/sql/gisaid.sql:160-166) via explode of the
    character array."""
    docs = load_table(spark, sf_dir, "documents")
    seq = F.upper(F.regexp_replace("text", "[^acgt]", ""))
    return (
        docs.select(F.explode(F.expr("regexp_extract_all(upper(regexp_replace(text, '[^acgt]', '')), '(.)', 1)")).alias("base"))
        .groupBy("base")
        .agg(F.count(F.lit(1)).alias("n"))
    )
