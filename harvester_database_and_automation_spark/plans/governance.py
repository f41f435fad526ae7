"""Data-governance queries: PII redaction and retention erasure.

The reference erases columns wholesale once a retention window lapses
(`database/sql/2022-03-31 Delete some BAG data.sql:1-80` nulls
division/location/age columns in place). A 100 TB training corpus needs
both that column-level erasure and the finer substring-level redaction
(emails/IPs/phones inside document text). Both are pure projections —
no shuffle anywhere except the final small aggregate, so the plans are
embarrassingly parallel at any scale.

The corpus tables carry no real PII, so the scrub query first derives a
deterministic contact note per customer (same expression in Spark and the
DuckDB oracle) and then runs the shared redaction chain from
``functions/pii.py`` over it — the operator under test is the scrubber,
not the note builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.functions.pii import pii_counts, scrub_pii
from harvester_database_and_automation_spark.plans.registry import register


@register(
    "pii_scrub_stats",
    survey_ref="text-analysis,P4,M3",
    oracle="""
WITH notes AS (
  SELECT c_mktsegment,
         'contact ' || c_name
           || CASE WHEN c_custkey % 3 <> 0
                   THEN ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com>'
                   ELSE '' END
           || CASE WHEN c_custkey % 2 = 0
                   THEN ' tel 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
           || ' ip 10.' || CAST(c_nationkey AS VARCHAR)
           || '.' || CAST(c_custkey % 256 AS VARCHAR) || '.7' AS note
  FROM customer
),
scrubbed AS (
  SELECT c_mktsegment,
         note,
         len(regexp_extract_all(note, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(note, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ip,
         len(regexp_extract_all(note, '\\b\\d{3}-\\d{4}\\b')) AS n_phone,
         regexp_replace(
           regexp_replace(
             regexp_replace(note,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g'),
           '\\b\\d{3}-\\d{4}\\b', '[PHONE]', 'g') AS redacted
  FROM notes
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT)                          AS n_notes,
       CAST(sum(n_email) AS BIGINT)                      AS emails_found,
       CAST(sum(n_ip) AS BIGINT)                         AS ips_found,
       CAST(sum(n_phone) AS BIGINT)                      AS phones_found,
       CAST(sum(length(note) - length(redacted)) AS BIGINT) AS chars_redacted
FROM scrubbed
GROUP BY c_mktsegment
""",
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level PII redaction audit.

    Build a deterministic contact note per customer (emails on 2/3 of
    keys, phones on even keys, an IP always), run the shared
    email→IP→phone `regexp_replace` chain, and report per-segment match
    counts plus total characters redacted. Scan → map → one partial-agg
    shuffle on 5 segment keys: the 100 TB plan is a full-speed codegen
    pipeline over the input splits."""
    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    note = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.when(key % 3 != 0,
               F.concat(F.lit(" <user"), key.cast("string"), F.lit("@example.com>"))
               ).otherwise(""),
        F.when(key % 2 == 0,
               F.concat(F.lit(" tel 555-"), F.lpad((key % 10000).cast("string"), 4, "0"))
               ).otherwise(""),
        F.lit(" ip 10."),
        F.col("c_nationkey").cast("string"),
        F.lit("."),
        (key % 256).cast("string"),
        F.lit(".7"),
    )
    noted = cust.select("c_mktsegment", note.alias("note"))
    counts = pii_counts(F.col("note"))
    scrubbed = noted.select(
        "c_mktsegment",
        "note",
        counts["emails"].alias("n_email"),
        counts["ips"].alias("n_ip"),
        counts["phones"].alias("n_phone"),
        scrub_pii(F.col("note")).alias("redacted"),
    )
    return scrubbed.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_notes"),
        F.sum("n_email").cast("bigint").alias("emails_found"),
        F.sum("n_ip").cast("bigint").alias("ips_found"),
        F.sum("n_phone").cast("bigint").alias("phones_found"),
        F.sum(F.length("note") - F.length("redacted")).cast("bigint").alias("chars_redacted"),
    )


@register(
    "kanonymity_audit",
    survey_ref="governance,A1,A5,P4",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         count(*) AS n
  FROM customer GROUP BY 1, 2, 3
)
SELECT CASE WHEN n < 5 THEN 'suppress' WHEN n < 10 THEN 'generalize' ELSE 'ok' END AS k_band,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(n) AS BIGINT)   AS n_rows,
       CAST(min(n) AS BIGINT)   AS min_class_size,
       CAST(max(n) AS BIGINT)   AS max_class_size
FROM classes GROUP BY 1
""",
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (nation, segment,
    account-balance band): size every equivalence class and band it by the
    re-identification policy — classes under k=5 must be suppressed,
    under 10 generalized (coarser bands), at 10+ released as-is. The
    release pipeline's privacy gate before any per-record export.

    Two cascaded hash aggregations (class sizes, then the 3-row band
    rollup) — both partial-aggregate map-side, so the 100 TB plan is one
    shuffle of class-key cardinality, never row cardinality."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count("*").alias("n"))
    band = (
        F.when(F.col("n") < 5, "suppress")
        .when(F.col("n") < 10, "generalize")
        .otherwise("ok")
    )
    return classes.groupBy(band.alias("k_band")).agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.min("n").cast("bigint").alias("min_class_size"),
        F.max("n").cast("bigint").alias("max_class_size"),
    )


@register(
    "retention_erasure_audit",
    survey_ref="M3,P2,A2",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT)                                   AS n_rows,
       CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS BIGINT)
                                                                  AS n_props_erased,
       round(sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 0.0 ELSE value END), 4)
                                                                  AS value_retained,
       CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15'
                     THEN length(props) ELSE 0 END) AS BIGINT)    AS bytes_freed
FROM events
GROUP BY event_type
""",
)
def retention_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level retention erasure, audited.

    Mirrors the reference's retention pass (null the sensitive columns of
    every row older than the cutoff, keep the row): classify rows against
    the 2024-01-15 cutoff, null `props` and zero `value` on the expired
    side, and report per-type how many rows were scrubbed and how many
    bytes the erased payload frees. The erasure itself is a projection —
    the parquet rewrite at scale is a partition-overwrite of only the
    partitions holding expired rows."""
    events = load_table(spark, sf_dir, "events")
    # NTZ literal, not cast("timestamp"): the bare cast builds a
    # session-zone LTZ and couples the cutoff comparison to the session
    # timezone (the _ntz discipline from plans/relational.py).
    expired = F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz")
    erased = events.select(
        "event_type",
        expired.alias("expired"),
        F.when(expired, F.lit(None).cast("string")).otherwise(F.col("props")).alias("props_out"),
        F.when(expired, F.lit(0.0)).otherwise(F.col("value")).alias("value_out"),
        F.length("props").alias("props_len"),
    )
    return erased.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("expired").cast("int")).cast("bigint").alias("n_props_erased"),
        F.round(F.sum("value_out"), 4).alias("value_retained"),
        F.sum(F.when(F.col("expired"), F.col("props_len")).otherwise(0)).cast("bigint").alias("bytes_freed"),
    )


@register(
    "ldiversity_audit",
    survey_ref="governance,A1,A3,P4",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         count(*) AS n,
         count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS l
  FROM customer GROUP BY 1, 2
)
SELECT CASE WHEN l < 2 THEN 'homogeneous' WHEN l < 3 THEN 'weak' ELSE 'ok' END AS l_band,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(n) AS BIGINT)   AS n_rows,
       CAST(min(l) AS BIGINT)   AS min_diversity
FROM classes GROUP BY 1
""",
)
def ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary complement: a class
    can be large (k-safe) yet expose everyone in it when the SENSITIVE
    attribute (balance band here) is homogeneous within the class. Count
    distinct sensitive values per quasi-identifier class and band the
    classes: l<2 means an attacker who places a person in the class
    learns their value with certainty.

    Same two-cascaded-aggregation shape as `kanonymity_audit`; the
    distinct count dedupes map-side on (class, sensitive) before the
    class rollup, so no class's rows ever converge on one reducer."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n"),
        F.countDistinct(F.floor(F.col("c_acctbal") / 2000).cast("bigint")).alias("l"),
    )
    band = (
        F.when(F.col("l") < 2, "homogeneous")
        .when(F.col("l") < 3, "weak")
        .otherwise("ok")
    )
    return classes.groupBy(band.alias("l_band")).agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.min("l").cast("bigint").alias("min_diversity"),
    )
