"""Multimodal pipeline exercised as a registered (rows-only) query.

The decode/feature stages run through Arrow-batched ``mapInPandas``
(sources/multimodal.py) — genuinely non-SQL-expressible, so this entry has
no DuckDB oracle and the driver records the weaker rows-present check.
The media table is synthesized deterministically from the documents corpus
(bytes = utf-8 text), so every run sees identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.plans.registry import register


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA-shaped frame: opaque bytes + typed meta."""
    docs = load_table(spark, sf_dir, "documents")
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.repartition(n).select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("synthetic").alias("format"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 100).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


@register("media_decode_stats", survey_ref="multimodal,S8-shape,A1")
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (deterministic fake) + feature-extract every media item via
    mapInPandas, then aggregate per kind: item count, mean payload size,
    mean pseudo-embedding norm. The plan shape is the real one — binary
    column scan → Arrow batches → fixed-width vectors → hash agg — only
    the codec inside the batch function is faked (no image/audio libs in
    this environment; sources/multimodal.py gates the real path behind
    NotImplementedError)."""
    from harvester_database_and_automation_spark.sources.multimodal import (
        decode_media,
        extract_features,
    )

    media = _media_table(spark, sf_dir)
    decoded = decode_media(media, fake=True)
    feats = extract_features(media)
    norm = F.sqrt(F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        decoded.join(feats, "media_id")
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.round(F.avg(norm), 6).alias("avg_feature_norm"),
        )
    )
