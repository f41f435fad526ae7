"""Multimodal pipeline exercised as registered queries.

The decode/feature stages run through Arrow-batched ``mapInPandas``
(sources/multimodal.py). ``media_decode_stats`` (which folds in the
sha256-seeded pseudo-embedding norms) has no DuckDB oracle and records the
weaker rows-present check; ``media_decode_parity`` puts the decode stage
itself under the full value-hash gate — DuckDB recomputes byte length /
exact byte sum / sha256 from the same payloads. The media table is
synthesized deterministically from the documents corpus (bytes = utf-8
text), so every run sees identical inputs.
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


# Hex nibble -> int via position in the hex alphabet (strpos is 1-based).
_HEXPOS = "strpos('0123456789abcdef', h[{c}]) - 1"


@register(
    "media_decode_stats",
    survey_ref="multimodal,S8-shape,A1",
    oracle=f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text, sha256(text) AS h
  FROM documents
),
feat AS (
  SELECT media_id, kind,
         octet_length(encode(text)) AS n_bytes,
         sqrt(CAST(list_sum(list_transform(generate_series(0, 15), i ->
             CAST(({_HEXPOS.format(c='i*2+1')}) * 16
                  + {_HEXPOS.format(c='i*2+2')} AS BIGINT)
             * CAST(({_HEXPOS.format(c='i*2+1')}) * 16
                    + {_HEXPOS.format(c='i*2+2')} AS BIGINT)
         )) AS DOUBLE)) / 255.0 AS norm
  FROM media
)
SELECT kind, CAST(count(*) AS BIGINT) AS n_items,
       round(avg(n_bytes), 4) AS avg_bytes,
       round(avg(norm), 6) AS avg_feature_norm
FROM feat GROUP BY kind
""",
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (deterministic fake) + feature-extract every media item via
    mapInPandas, then aggregate per kind: item count, mean payload size,
    mean pseudo-embedding norm. The plan shape is the real one — binary
    column scan → Arrow batches → fixed-width vectors → hash agg — only
    the codec inside the batch function is faked (no image/audio libs in
    this environment; sources/multimodal.py gates the real path behind
    NotImplementedError).

    The DuckDB oracle replays the fake decoder's arithmetic from the same
    payloads (sha256 hex → digest bytes → norm), putting even this stage
    under the value-hash gate. The per-item norm is computed from the
    INTEGER sum of squared digest bytes — exact in any summation order —
    then sqrt/255 once, so both engines produce bit-identical norms; the
    feature byte is recovered from the stored feature exactly via
    round(x*255)."""
    from harvester_database_and_automation_spark.sources.multimodal import (
        decode_media,
        extract_features,
    )

    media = _media_table(spark, sf_dir)
    decoded = decode_media(media, fake=True)
    feats = extract_features(media)
    sq_sum = F.aggregate(
        F.transform("features", lambda x: F.round(x * 255).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + b * b,
    )
    norm = F.sqrt(sq_sum.cast("double")) / 255.0
    return (
        decoded.join(feats, "media_id")
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.round(F.avg(norm), 6).alias("avg_feature_norm"),
        )
    )


@register(
    "video_frame_sample_plan",
    survey_ref="multimodal,array-explode,P2",
    oracle="""
SELECT media_id, CAST(u.f AS INT) AS frame_idx
FROM (
  SELECT doc_id AS media_id, CAST(n_chars % 100 AS INT) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
) v, unnest(generate_series(0, n_frames - 1, 10)) AS u(f)
WHERE n_frames > 0
""",
)
def video_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling manifest for the video rows — the
    metadata-only explode that drives a later per-frame decode stage
    (sources/multimodal.py::sample_frames). Zero-frame videos sample to
    nothing on both engines. At scale this is the fan-out table a video
    pipeline joins back to the binary column, so the blob itself is never
    exploded — only (media_id, frame_idx) rows are."""
    from harvester_database_and_automation_spark.sources.multimodal import sample_frames

    media = _media_table(spark, sf_dir)
    return sample_frames(media, every_n=10).select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


@register(
    "media_decode_parity",
    survey_ref="multimodal,A1,A3",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text
  FROM documents
),
decoded AS (
  SELECT media_id, kind,
         octet_length(encode(text)) AS n_bytes,
         -- UTF-8 BYTE sum from the hex of the encoded payload: ascii(c)
         -- would sum CODEPOINTS, diverging from the Spark stage's byte
         -- sum on any non-ASCII text (and text::BLOB errors outright).
         coalesce((SELECT sum(('0x' || substr(hex(encode(media.text)), 2 * u.i - 1, 2))::BIGINT)
                   FROM unnest(generate_series(1, octet_length(encode(media.text)))) AS u(i)), 0)
           AS byte_sum,
         sha256(text) AS content_sha256
  FROM media
)
SELECT kind,
       count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(byte_sum) AS BIGINT) AS byte_code_sum,
       round(sum(byte_sum) * 1.0 / sum(n_bytes), 6) AS mean_byte,
       CAST(count(DISTINCT content_sha256) AS BIGINT) AS n_distinct_payloads
FROM decoded
GROUP BY kind
""",
)
def media_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-checked twin of media_decode_stats: the Arrow-batched fake
    decode stage (byte length / exact byte sum / sha256 per item) rolled up
    per kind, against a DuckDB oracle that recomputes the identical
    statistics from the same payloads (sha256 on both sides hashes
    the same utf-8 bytes). This puts the mapInPandas decode path itself
    under the hash gate (byte sums computed from the UTF-8 encoding on
    both sides, so non-ASCII payloads stay in parity) — only the codec
    call remains faked, as declared in
    sources/multimodal.py. Aggregates stay on exact integers; the single
    double division happens once per group on both sides."""
    from harvester_database_and_automation_spark.sources.multimodal import decode_media

    decoded = decode_media(_media_table(spark, sf_dir), fake=True)
    return decoded.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("byte_sum").cast("bigint").alias("byte_code_sum"),
        F.round(F.sum("byte_sum") * 1.0 / F.sum("n_bytes"), 6).alias("mean_byte"),
        F.countDistinct("content_sha256").cast("bigint").alias("n_distinct_payloads"),
    )
