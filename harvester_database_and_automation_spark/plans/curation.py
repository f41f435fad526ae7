"""Corpus-curation queries — the planning stages of a training-data
pipeline that sit between cleaning/dedup and shard writing: packing
documents into fixed-size context windows, unigram language-model quality
scoring, and temperature-weighted domain mixing.

These generalize the reference's release-planning patterns (work-queue
slices, per-batch manifests — database/R/export_spsp_submission.R's
chunked submission planning) to the shapes an LLM data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.operators.ids import add_running_total
from harvester_database_and_automation_spark.plans.registry import register
from harvester_database_and_automation_spark.plans.shared import fanout as _fanout
from harvester_database_and_automation_spark.plans.text import _SHINGLES_SQL

# Context-window budget for sequence packing (tokens per training sample).
_PACK_BUDGET = 2048


@register(
    "sequence_pack_manifest",
    survey_ref="pipeline-packing,W1,A1",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
cum AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start
  FROM toks
),
spans AS (
  SELECT doc_id, n_tok, start,
         start // {_PACK_BUDGET} AS first_bin,
         (start + n_tok - 1) // {_PACK_BUDGET} AS last_bin
  FROM cum
),
x AS (
  SELECT doc_id, n_tok, start, first_bin, last_bin, u.b AS bin_id
  FROM spans, unnest(generate_series(first_bin, last_bin)) AS u(b)
)
SELECT bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN last_bin > first_bin THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning,
       CAST(sum(least(start + n_tok, (bin_id + 1) * {_PACK_BUDGET})
                - greatest(start, bin_id * {_PACK_BUDGET})) AS BIGINT) AS n_tokens
FROM x GROUP BY bin_id
""",
)
def sequence_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing manifest: concatenate the corpus in
    doc_id order and chunk it at a fixed token budget (docs may span a
    chunk boundary); report, per context-window bin, how many docs touch
    it, how many of those span a boundary, and its token fill.

    The global token offset is an exclusive prefix sum via
    :func:`operators.ids.add_running_total` — the two-pass
    partition-offset pattern, NOT a single-partition window, so the same
    plan packs a 100 TB corpus (only per-partition token totals reach the
    driver). Everything downstream is integer arithmetic: explode the
    [first_bin, last_bin] span, clip each doc's contribution to the bin
    edges, one hash aggregation. Output is hash-exact (no floats)."""
    b = _PACK_BUDGET
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    cum = add_running_total(toks, ["doc_id"], "n_tok", "start")
    spans = cum.select(
        "doc_id",
        "n_tok",
        "start",
        F.expr(f"start div {b}").alias("first_bin"),
        F.expr(f"(start + n_tok - 1) div {b}").alias("last_bin"),
    )
    x = spans.select(
        "n_tok",
        "start",
        "first_bin",
        "last_bin",
        F.explode(F.sequence("first_bin", "last_bin")).alias("bin_id"),
    )
    return x.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("last_bin") > F.col("first_bin")).cast("int")).cast("bigint").alias("n_spanning"),
        F.sum(
            F.least(F.col("start") + F.col("n_tok"), (F.col("bin_id") + 1) * b)
            - F.greatest(F.col("start"), F.col("bin_id") * b)
        ).cast("bigint").alias("n_tokens"),
    )


@register(
    "unigram_logprob_quality",
    survey_ref="text-analysis,A7,A8",
    oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
freq AS (SELECT word, count(*) AS c FROM tok GROUP BY 1),
total AS (SELECT count(*) AS n FROM tok)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       round(avg(ln(c * 1.0 / n)), 6) AS avg_logprob
FROM tok JOIN freq USING (word) CROSS JOIN total
GROUP BY doc_id
""",
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: each document's mean token
    log-probability under the corpus's own unigram distribution — the
    cheap perplexity proxy used to rank documents before an expensive
    model-based quality filter.

    Scale shape: token frequencies are a map-side-combined groupBy whose
    vocab-sized output joins back onto the token stream — broadcast while
    small (AQE decides), shuffle-join once the vocabulary outgrows the
    broadcast limit; the per-doc average is a second partial aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = tok.agg(F.count(F.lit(1)).alias("n"))
    return (
        # freq is vocabulary-sized — unbounded at corpus scale (ids,
        # numerals, typos), so no broadcast hint: AQE broadcasts it while
        # it is small and falls back to a shuffle join when it is not.
        tok.join(freq, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(F.avg(F.log(F.col("c") * 1.0 / F.col("n"))), 6).alias("avg_logprob"),
        )
    )


@register(
    "curation_funnel_report",
    survey_ref="pipeline-curation,P4,A2,A10,J1",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
),
q AS (
  SELECT doc_id, lang, text, CAST(len(w) AS BIGINT) AS n_tok,
         len(w) >= 30 AND len(list_filter(w, x -> x IN ('the', 'a'))) >= 1 AS is_q
  FROM d
),
keepers AS (
  SELECT md5(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp, min(doc_id) AS keep_id
  FROM q WHERE is_q GROUP BY 1
),
ex AS (
  SELECT q.doc_id, q.lang, q.n_tok, q.is_q,
         COALESCE(q.is_q AND k.keep_id = q.doc_id, FALSE) AS is_e
  FROM q LEFT JOIN keepers k ON k.fp = md5(translate(q.text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'))
),
sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes s1 ON s1.doc_id = i.doc_a
  JOIN sizes s2 ON s2.doc_id = i.doc_b
  JOIN ex ea ON ea.doc_id = i.doc_a AND ea.is_e
  JOIN ex eb ON eb.doc_id = i.doc_b AND eb.is_e
  WHERE i.n_common * 1.0 / (s1.sz + s2.sz - i.n_common) >= 0.5
),
dropped AS (SELECT DISTINCT doc_b FROM pairs),
fin AS (
  SELECT ex.lang, ex.n_tok, ex.is_q, ex.is_e,
         ex.is_e AND dr.doc_b IS NULL AS is_f
  FROM ex LEFT JOIN dropped dr ON dr.doc_b = ex.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT)                                  AS n_input,
       CAST(sum(CASE WHEN is_q THEN 1 ELSE 0 END) AS BIGINT)     AS n_after_quality,
       CAST(sum(CASE WHEN is_e THEN 1 ELSE 0 END) AS BIGINT)     AS n_after_exact,
       CAST(sum(CASE WHEN is_f THEN 1 ELSE 0 END) AS BIGINT)     AS n_final,
       CAST(sum(CASE WHEN is_f THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_final
FROM fin GROUP BY lang
""",
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline composed end-to-end, reported as a per-language
    funnel: input -> quality filter (>= 30 tokens with stopwords, the
    `doc_quality_score` 'ok' rule) -> exact dedup (keep the lowest doc_id
    per content hash) -> near-dup drop (any survivor whose shingle Jaccard
    with a LOWER-id survivor is >= 0.5 is dropped — the greedy by-id rule,
    deterministic in both engines without a transitive closure), with the
    surviving token budget. This is the single number a training-data run
    starts from, and the stage-by-stage shrinkage is the report a curation
    review asks for.

    The near-dup stage reads the MAINTAINED `dup_pairs` derived table
    (pipelines/derived.py `read_derived` — the inverted-index self-join
    runs once per ingest in the LAYER publish; parquet round-trips the
    unrounded double exactly, so thresholding the stored score at 0.5
    matches the inline computation bit-for-bit, and the oracle replays
    the whole derivation from raw text). Every stage flag is
    boolean/integer, so the funnel is hash-exact. Scale shape: flags are
    projections over the scan plus one content-hash aggregate; the
    near-dup stage is a published-parquet scan — nothing new shuffles at
    corpus scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    words = F.split("text", " ")
    is_q = (F.size(words) >= 30) & (
        F.size(F.filter(words, lambda w: w.isin("the", "a"))) >= 1
    )
    q = docs.select(
        "doc_id",
        "lang",
        F.md5(F.translate("text", "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")).alias("fp"),
        F.size(words).cast("bigint").alias("n_tok"),
        is_q.alias("is_q"),
    )
    keepers = (
        q.filter("is_q").groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    )
    # Three consumers read the flag frame (both near-dup endpoint filters
    # and the final rollup); checkpointing the NARROW flags (ids + bools,
    # no text) computes them once instead of re-expanding the corpus scan
    # per consumer — the dup_connected_components pattern.
    ex = (
        q.join(keepers, "fp", "left")
        .select(
            "doc_id",
            "lang",
            "n_tok",
            "is_q",
            F.coalesce(
                F.col("is_q") & (F.col("keep_id") == F.col("doc_id")), F.lit(False)
            ).alias("is_e"),
        )
        .localCheckpoint(eager=True)
    )
    surv = ex.filter("is_e").select("doc_id")
    from harvester_database_and_automation_spark.pipelines.derived import read_derived

    pairs = (
        read_derived(spark, sf_dir, "dup_pairs")
        .filter(F.col("jaccard") >= 0.5)
        .join(surv.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(surv.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
    )
    dropped = pairs.select("doc_b").distinct()
    fin = ex.join(dropped, ex.doc_id == dropped.doc_b, "left").select(
        "lang",
        "n_tok",
        "is_q",
        "is_e",
        (F.col("is_e") & F.col("doc_b").isNull()).alias("is_f"),
    )
    return fin.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_input"),
        F.sum(F.col("is_q").cast("int")).cast("bigint").alias("n_after_quality"),
        F.sum(F.col("is_e").cast("int")).cast("bigint").alias("n_after_exact"),
        F.sum(F.col("is_f").cast("int")).cast("bigint").alias("n_final"),
        F.sum(F.when(F.col("is_f"), F.col("n_tok")).otherwise(0)).cast("bigint").alias(
            "tokens_final"
        ),
    )


@register(
    "token_length_outliers",
    survey_ref="text-analysis,A1,A7,P4",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents
),
stats AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT)   AS s,
         CAST(sum(x * x) AS BIGINT) AS ss
  FROM toks GROUP BY lang, source
)
SELECT t.lang, t.source,
       CAST(st.n AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN (t.x::HUGEINT * st.n - st.s) * (t.x::HUGEINT * st.n - st.s)
                          > 4 * (st.n::HUGEINT * st.ss - st.s::HUGEINT * st.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(st.s * 1.0 / st.n, 6) AS mean_tokens
FROM toks t JOIN stats st USING (lang, source)
GROUP BY t.lang, t.source, st.n, st.s
""",
)
def token_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier filter for curation: per (lang, source) stratum,
    count documents whose token length sits more than 2 standard deviations
    from the stratum mean — the distribution-based pruning pass that runs
    after rule filters and before dedup.

    The |z| > 2 test is evaluated in INTEGER arithmetic:
    (x*n - S)^2 > 4*(n*SS - S^2) is z^2 > 4 with both sides multiplied by
    n^2*sigma^2 — so the cut is exact in both engines with no float
    boundary to disagree on (a float z-score at 1.9999999 vs 2.0000001
    would flip rows between engines). The products are evaluated at
    128-bit (decimal(38,0) / HUGEINT): the squared terms leave int64
    around 10M docs per stratum (n*SS ~ E[x^2]*n^2), far below the 100 TB
    posture, while 38 digits cover n up to ~10^15.

    Scale shape: stratum moments are one partial-agg groupBy whose output
    is stratum-sized, broadcast back onto the scan — two small shuffles
    regardless of corpus size (the `unigram_logprob_quality` shape)."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.size(F.split("text", " ")).cast("bigint").alias("x")
    )
    stats = toks.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    dev = d38("x") * F.col("n") - F.col("s")
    is_outlier = dev * dev > 4 * (d38("n") * F.col("ss") - d38("s") * F.col("s"))
    return (
        toks.join(F.broadcast(stats), ["lang", "source"])
        .groupBy("lang", "source", "n", "s")
        .agg(
            F.sum(is_outlier.cast("int")).cast("bigint").alias("n_outliers"),
        )
        .select(
            "lang",
            "source",
            F.col("n").alias("n_docs"),
            "n_outliers",
            F.round(F.col("s") * 1.0 / F.col("n"), 6).alias("mean_tokens"),
        )
    )


@register(
    "domain_temperature_mix",
    survey_ref="pipeline-mix,A7,A8",
    oracle="""
WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT sum(sqrt(n_docs)) AS sw, CAST(sum(n_docs) AS BIGINT) AS nd FROM counts)
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(sqrt(n_docs) / sw, 6) AS mix_weight,
       round(nd * sqrt(n_docs) / sw, 1) AS expected_docs
FROM counts CROSS JOIN tot
""",
)
def domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixing (alpha = 0.5): per-language
    sampling weights proportional to n_docs^alpha, the standard rebalance
    that up-samples low-resource domains when assembling a training mix.

    alpha = 0.5 is computed as sqrt(), which IEEE 754 requires to be
    correctly rounded — so both engines produce bit-identical weights
    (a pow(x, 0.7)-style temperature would drift in the last ulp across
    libm implementations). The whole query is two tiny aggregates over a
    language-count frame; the scalar denominator joins back as a
    broadcast, the A8 shape."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = counts.agg(
        F.sum(F.sqrt("n_docs")).alias("sw"),
        F.sum("n_docs").cast("bigint").alias("nd"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.sqrt("n_docs") / F.col("sw"), 6).alias("mix_weight"),
        F.round(F.col("nd") * F.sqrt("n_docs") / F.col("sw"), 1).alias("expected_docs"),
    )


# RAG-chunking geometry: window size / stride in characters. Stride < size
# so consecutive chunks overlap (retrieval context straddles boundaries).
_CHUNK_SIZE = 120
_CHUNK_STRIDE = 90


@register(
    "doc_chunk_manifest",
    survey_ref="pipeline-chunking,array-explode,P1",
    oracle=f"""
SELECT doc_id,
       CAST(u.i AS INT)                                    AS chunk_idx,
       CAST(u.i * {_CHUNK_STRIDE} AS BIGINT)               AS start,
       CAST(length(substr(text, u.i * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE})) AS INT)
                                                           AS chunk_chars,
       md5(substr(text, u.i * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE}))
                                                           AS chunk_md5
FROM documents,
     unnest(generate_series(
       0, (greatest(0, length(text) - {_CHUNK_SIZE}) + {_CHUNK_STRIDE} - 1)
          // {_CHUNK_STRIDE})) AS u(i)
""",
)
def doc_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunk manifest: slice every document into fixed-size
    character windows (120 chars at stride 90, so consecutive chunks
    overlap by 30) and emit one row per chunk with its
    offset, actual length (the tail chunk is shorter), and content md5 —
    the manifest a retrieval indexer consumes downstream.

    Chunk count per doc is the integer ceil((len - size)/stride) + 1,
    computed with integer `div` on both engines so the plan is float-free
    until the md5. Scale shape: pure map-side `sequence` + `explode` —
    zero shuffles, zero UDFs; the scan's projection is (doc_id, text)
    only, and a 100 TB corpus chunks at scan speed. Mirrors the
    reference's chunked submission planning
    (database/R/export_spsp_submission.R:244-273) re-aimed at retrieval
    indexing."""
    size, stride = _CHUNK_SIZE, _CHUNK_STRIDE
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    last = F.expr(f"(greatest(0, length(text) - {size}) + {stride - 1}) div {stride}")
    chunk = F.expr(f"substr(text, chunk_idx * {stride} + 1, {size})")
    return (
        docs.select("doc_id", "text", F.explode(F.sequence(F.lit(0), last)).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("bigint").alias("start"),
            F.length(chunk).cast("int").alias("chunk_chars"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


@register(
    "source_boilerplate_fraction",
    survey_ref="pipeline-boilerplate,text-analysis,A1,J1,A7",
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
src AS (SELECT doc_id, source FROM documents),
labeled AS (SELECT sh.doc_id, src.source, sh.shingle FROM sh JOIN src USING (doc_id)),
src_totals AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM src GROUP BY source),
df AS (
  SELECT source, shingle, count(*) AS n_docs_with
  FROM labeled GROUP BY source, shingle
),
boiler AS (
  SELECT df.source, df.shingle
  FROM df JOIN src_totals USING (source)
  WHERE df.n_docs_with * 10 >= src_totals.n_docs * 3
)
SELECT l.doc_id,
       l.source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(b.shingle) AS BIGINT) AS n_boiler,
       round(count(b.shingle) * 1.0 / count(*), 6) AS boiler_frac
FROM labeled l
LEFT JOIN boiler b ON b.source = l.source AND b.shingle = l.shingle
GROUP BY l.doc_id, l.source
""",
)
def source_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection (the CCNet/RefinedWeb cleaning
    step, adapted from lines to 3-word shingles since the synthetic corpus
    has no line structure): a shingle is boilerplate within a source when
    it appears in >= 30% of that source's documents; each document then
    reports what fraction of its distinct shingles are source-boilerplate
    — the signal a curation pipeline thresholds to drop templated pages.

    Scale shape: reads the MAINTAINED `shingle_index` derived table
    (pipelines/derived.py `read_derived` — digests only, the explode +
    distinct runs once per ingest in the LAYER publish, and the oracle
    replays the derivation from raw text so publish + read stays
    hash-certified; every operation here is digest-equality, so the md5
    projection changes nothing). The 30% threshold compares integers
    (n_docs_with * 10 >= n_docs * 3) so the gate is float-free.

    The oracle states the labeled frame three times (DF table, boiler
    set, final rollup); a literal translation re-planned the whole
    scan + doc_id join per consumer (inferred isnotnull filters make the
    subtrees non-identical, so ReuseExchange never fires — the
    binned-quantile lesson in PLANS.md: 16 exchanges, three scans of the
    published index, SHUFFLE_BYTES.json flagged it). Registered form
    states it ONCE: the per-(source, shingle) document frequency is a
    COUNT WINDOW over the single shuffled frame rather than a separate
    aggregate joined back, the boilerplate verdict is then a per-row
    integer compare against the broadcast source totals, and the only
    other exchange is the final per-doc rollup — the two shuffles are
    the algorithm's inherent minimum, and no join of corpus-sized frames
    remains at all. Window partitions are (source, shingle) groups,
    bounded by a source's document count, so no single-partition sort
    appears at any scale. Measured 1.45 s → 1.10 s warm at sf0.1 (and
    localCheckpoint materialization, the alternative barrier, measured
    SLOWER than both at this scale: ~100 MB of block writes to save
    three dictionary-compressed 32 MB scans)."""
    from harvester_database_and_automation_spark.pipelines.derived import read_derived

    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    labeled = (
        read_derived(spark, sf_dir, "shingle_index")
        .withColumnRenamed("shingle_digest", "shingle")
        .join(src, "doc_id")
        .select("doc_id", "source", "shingle")
    )
    src_totals = src.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("source", "shingle")
    flagged = (
        labeled.withColumn("n_docs_with", F.count(F.lit(1)).over(w))
        .join(F.broadcast(src_totals), "source")
        .withColumn("is_boiler", F.col("n_docs_with") * 10 >= F.col("n_docs") * 3)
    )
    return flagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.col("is_boiler").cast("int")).cast("bigint").alias("n_boiler"),
        F.round(F.sum(F.col("is_boiler").cast("int")) * 1.0 / F.count(F.lit(1)), 6).alias(
            "boiler_frac"
        ),
    )


@register(
    "weighted_quality_sample",
    survey_ref="pipeline-sampling,J8,W2,O3",
    oracle="""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         -ln(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             / CAST(1152921504606846976 AS DOUBLE)) / n_chars AS jitter
  FROM documents
)
SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(sample_rank AS INT) AS sample_rank
FROM (
  SELECT lang, doc_id, n_chars, jitter,
         row_number() OVER (PARTITION BY lang ORDER BY jitter, doc_id) AS sample_rank
  FROM keyed
) t
WHERE sample_rank <= 10
""",
)
def weighted_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement (Efraimidis-
    Spirakis A-ExpJ keys): per language, draw 10 documents with inclusion
    probability proportional to a quality weight (n_chars standing in for
    a quality score) by ranking on the exponential jitter -ln(u)/w, u a
    deterministic md5-uniform of the doc id. The k smallest jitters ARE a
    weighted sample without replacement — the corpus-assembly step that
    up-samples high-quality documents instead of sampling uniformly
    (`corpus_mix_sample` is the unweighted quota variant).

    Determinism note: ln is not IEEE-correctly-rounded across libms, so
    the jitter itself never appears in the output — only the integer rank
    — and an order flip needs two keys within ~1 ulp (probability ~1e-13
    for 60-bit uniforms). Scale shape: one map pass computes keys, the
    per-lang top-k is a ranking window per domain; at extreme skew the
    same keys feed a `min_by(array, k)` aggregate instead — either way
    the text never shuffles, only (lang, id, key) triples."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    u = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"
    ) / F.lit(1152921504606846976).cast("double")
    keyed = docs.withColumn("jitter", -F.log(u) / F.col("n_chars"))
    w = Window.partitionBy("lang").orderBy(F.col("jitter").asc(), F.col("doc_id").asc())
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 10)
        .select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )


@register(
    "corpus_split_assignment",
    survey_ref="pipeline-split,P4,A1,A2",
    oracle="""
WITH hashed AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 40 AS h
  FROM documents
),
assigned AS (
  SELECT doc_id, lang,
         CASE WHEN h < 38 THEN 'train' WHEN h = 38 THEN 'val' ELSE 'test' END AS split
  FROM hashed
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM assigned GROUP BY lang, split
""",
)
def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: hash the stable doc id
    (top 32 md5 bits mod 40 → 95/2.5/2.5) so membership is a pure
    function of identity — re-runs, backfills, and late-arriving shards
    all route every document to the same split with no coordination and
    no stored assignment table. Per-(lang, split) counts + id ranges
    certify the routing. One map pass + one hash aggregation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = (
        F.expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)") % 40
    )
    split = (
        F.when(h < 38, "train").when(h == 38, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
    )


@register(
    "oov_rate_by_source",
    survey_ref="text-analysis,A1,A7,J6",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, w
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
),
vocab AS (
  SELECT w FROM (
    SELECT w, count(*) AS c, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
    FROM toks GROUP BY w
  ) WHERE rk <= 20
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (v.w IS NULL) AS BIGINT) AS n_oov,
       round(count(*) FILTER (v.w IS NULL) * 1.0 / count(*), 6) AS oov_rate
FROM toks LEFT JOIN vocab v USING (w)
GROUP BY source
""",
)
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per feed: fix the vocabulary to the corpus
    top-20 terms (deterministic (count desc, word) rank) and measure what
    fraction of each source's token stream falls outside it — the
    tokenizer-coverage monitor that flags a feed whose content the
    training vocabulary won't represent well.

    Scale shape: the vocabulary ranking aggregates the token stream
    map-side then sorts the vocab-sized (word, count) frame — the top-k
    window runs over word-level aggregates, not occurrences (no hot-word
    skew); membership tagging is a broadcast left join; the per-source
    rates are one more hash agg. Rates are exact-int ratios in double."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = _fanout(docs).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # Top-20 via sort+limit (TakeOrderedAndProject over the vocab-sized
    # aggregate) — no global ranking window anywhere in the plan.
    vocab = (
        wc.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(20)
        .select(F.col("w"), F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).cast("bigint").alias("n_oov"),
            F.round(
                F.count(F.when(F.col("in_vocab").isNull(), 1)) * 1.0 / F.count(F.lit(1)), 6
            ).alias("oov_rate"),
        )
    )


# Power-of-two padding buckets for inference batching.
_PAD_BUCKETS = [8, 16, 32, 64, 128, 256]


@register(
    "padding_efficiency_manifest",
    survey_ref="pipeline-batching,P4,A1",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
bucketed AS (
  SELECT doc_id, n_tok,
         CASE {' '.join(f'WHEN n_tok <= {b} THEN {b}' for b in _PAD_BUCKETS)}
              ELSE {_PAD_BUCKETS[-1] * 2} END AS bucket
  FROM toks
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST((count(*) + 31) // 32 AS BIGINT) AS n_batches,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       round(sum(bucket - n_tok) * 1.0 / sum(bucket), 6) AS waste_frac
FROM bucketed GROUP BY bucket
""",
)
def padding_efficiency_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching manifest for inference/scoring passes:
    route each document to the smallest power-of-two token bucket, then
    report per bucket the batch count (batch size 32) and the padding
    waste fraction — the planning table that decides whether bucketed
    batching is worth it versus padding the whole corpus to max length
    (where waste routinely exceeds 50%).

    Pure map pass + one hash aggregation on a 7-value key; every number
    but the waste ratio is an integer. The CASE bucket ladder is the
    recode-table pattern (P4) pointed at batch geometry."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    bucket = F.lit(_PAD_BUCKETS[-1] * 2)
    for b in reversed(_PAD_BUCKETS):
        bucket = F.when(F.col("n_tok") <= b, b).otherwise(bucket)
    return (
        docs.withColumn("bucket", bucket)
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("(count(1) + 31) div 32").cast("bigint").alias("n_batches"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
            F.round(
                F.sum(F.col("bucket") - F.col("n_tok")) * 1.0 / F.sum("bucket"), 6
            ).alias("waste_frac"),
        )
    )


@register(
    "quality_vs_dup_calibration",
    survey_ref="pipeline-calibration,A1,A7,J2",
    oracle="""
WITH q AS (
  SELECT doc_id, text,
         least(1.0, len(string_split(text, ' ')) / 100.0) * 0.6
           + (len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a')))
              * 1.0 / len(string_split(text, ' '))) * 0.4 AS quality
  FROM documents
),
dups AS (
  SELECT doc_id, count(*) OVER (PARTITION BY md5(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'))) > 1 AS is_dup
  FROM documents
),
banded AS (
  SELECT least(9, greatest(0, CAST(floor(q.quality * 10) AS INT))) AS q_band,
         d.is_dup
  FROM q JOIN dups d USING (doc_id)
)
SELECT q_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (is_dup) AS BIGINT) AS n_dup_members,
       round(count(*) FILTER (is_dup) * 1.0 / count(*), 6) AS dup_rate
FROM banded GROUP BY q_band
""",
)
def quality_vs_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal calibration: does the heuristic quality score predict
    duplication? Band documents into quality deciles (fixed-width bands,
    not ntile — no global window) and report each band's exact-duplicate
    membership rate. A well-behaved curation stack expects low-quality
    bands to carry more boilerplate/duplicates; a flat curve says the
    quality filter and the deduper remove INDEPENDENT mass, a steep one
    says they overlap — this table is how you decide filter order.

    Scale shape: the dup flag is one hash aggregation keyed on the
    content digest (never text); the quality score is a map pass; one
    final 10-key rollup. The oracle's count-over-partition form is
    replayed as groupBy + join on the digest."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin("the", "a")))
    quality = F.least(F.lit(1.0), n_tokens / 100.0) * 0.6 + (n_stop * 1.0 / n_tokens) * 0.4
    fp = F.md5(F.translate("text", "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"))
    fp_counts = (
        docs.select(fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_same"))
    )
    banded = (
        docs.select(
            F.least(F.lit(9), F.greatest(F.lit(0), F.floor(quality * 10).cast("int"))).alias("q_band"),
            fp.alias("fp"),
        )
        .join(fp_counts, "fp")
        .select("q_band", (F.col("n_same") > 1).alias("is_dup"))
    )
    return banded.groupBy("q_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("is_dup"), 1)).cast("bigint").alias("n_dup_members"),
        F.round(F.count(F.when(F.col("is_dup"), 1)) * 1.0 / F.count(F.lit(1)), 6).alias("dup_rate"),
    )


@register(
    "neyman_allocation",
    survey_ref="pipeline-sampling,A1,A8,stats",
    oracle="""
WITH strata AS (
  SELECT lang,
         count(*) AS n_h,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY lang
),
scored AS (
  SELECT lang, n_h,
         n_h * sqrt((n_h::HUGEINT * s2 - s1::HUGEINT * s1) * 1.0 / (n_h::HUGEINT * (n_h - 1))) AS a_h
  FROM strata WHERE n_h > 1
),
tot AS (SELECT sum(a_h) AS a_tot FROM scored)
SELECT lang,
       CAST(n_h AS BIGINT) AS n_h,
       round(a_h / a_tot, 6) AS share,
       CAST(floor(a_h / a_tot * 1000 + 0.5) AS BIGINT) AS n_alloc
FROM scored CROSS JOIN tot
""",
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) allocation for stratified sampling: a 1000-doc
    evaluation sample should draw from each language in proportion to
    n_h·S_h (stratum size × stratum standard deviation of document
    length), not n_h alone — high-variance strata need more samples for
    the same estimator precision. This is the sample-design table that
    `stratified_sample_per_nation` (equal quotas) and
    `weighted_quality_sample` (per-item weights) don't provide.

    The variance comes from integer moments ((n·Σx² − (Σx)²)/(n(n−1))),
    with the products at 128-bit (decimal(38,0) / HUGEINT — s1² overflows
    int64 at only ~3M docs per stratum) so only the final sqrt/ratio is
    float (IEEE-identical); strata with
    one document drop (undefined variance). One hash aggregation plus a
    broadcast scalar — the design table is strata-sized at any corpus
    scale."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    strata = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    # 128-bit moment products: s1^2 leaves int64 at ~3M docs/stratum.
    a_h = F.col("n_h") * F.sqrt(
        (
            F.col("n_h").cast("decimal(38,0)") * F.col("s2")
            - F.col("s1").cast("decimal(38,0)") * F.col("s1")
        ).cast("double")
        / (F.col("n_h").cast("double") * (F.col("n_h") - 1))
    )
    scored = strata.filter(F.col("n_h") > 1).withColumn("a_h", a_h)
    tot = scored.agg(F.sum("a_h").alias("a_tot"))
    return scored.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_h").cast("bigint").alias("n_h"),
        F.round(F.col("a_h") / F.col("a_tot"), 6).alias("share"),
        F.floor(F.col("a_h") / F.col("a_tot") * 1000 + 0.5).cast("bigint").alias("n_alloc"),
    )


@register(
    "release_qc_report",
    survey_ref="W4,P4,A7,A1,pipeline-release",
    oracle="""
WITH annotated AS (
  SELECT doc_id, source, lang, n_chars,
         row_number() OVER (PARTITION BY floor(doc_id / 2)
                            ORDER BY n_chars, doc_id) AS duplicate_idx
  FROM documents
),
reasons AS (
  SELECT source,
         CASE WHEN n_chars < 150 THEN 'too_short'
              WHEN duplicate_idx >= 2 THEN 'duplicate'
              WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 'unsupported_lang'
              ELSE 'release' END AS reason
  FROM annotated
),
report AS (SELECT source, reason, count(*) AS n FROM reasons GROUP BY 1, 2),
tot AS (SELECT source, sum(n) AS n_total FROM report GROUP BY source),
rel AS (SELECT source, n AS n_released FROM report WHERE reason = 'release')
SELECT r.source, r.reason, CAST(r.n AS BIGINT) AS n,
       round(r.n * 1.0 / t.n_total, 6) AS frac_batch,
       coalesce(rl.n_released, 0) * 1.0 / t.n_total < 0.8 AS suspicious
FROM report r
JOIN tot t ON t.source = r.source
LEFT JOIN rel rl ON rl.source = r.source
""",
)
def release_qc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release rule-cascade's QC report as driver-hash evidence —
    `pipelines/release.py::build_release_plan` (the SPSP submission
    pipeline core, database/R/export_spsp_submission.R:142-375) was
    previously pytest-only. Per-key window dedup (fewest-chars-best with
    id tie-break — the W4 group-ranked index), an ordered first-match
    rule cascade (too-short, worse-duplicate, unsupported language,
    else release — exactly one reason per row, as case_when does), the
    per-batch rollup with frac_batch (the aggregate-of-aggregate share,
    :308-329), and the <80%-release suspicious-batch alert (:335-375)
    carried as a per-batch boolean.

    Stand-ins (deterministic): sample key := floor(doc_id/2) (duplicate
    pairs), quality := n_chars, batch := source.

    Scale shape: the dedup window partitions by sample key (groups of
    ~2, never a global sort); the cascade is one codegen'd CASE; the
    report is a dimension-sized aggregate and every join after it is
    dimension-sized."""
    from harvester_database_and_automation_spark.pipelines.release import (
        REASON_RELEASE,
        build_release_plan,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "k", F.floor(F.col("doc_id") / 2).cast("bigint")
    )
    rules = [
        ("too_short", F.col("n_chars") < 150),
        ("duplicate", F.col("duplicate_idx") >= 2),
        ("unsupported_lang", ~F.col("lang").isin("en", "de", "fr", "es")),
    ]
    _, report = build_release_plan(
        docs, key_col="k", quality_col="n_chars", batch_col="source",
        rules=rules, tiebreak_col="doc_id",
    )
    # The alert is a SHARE over the already-grouped dimension-sized
    # report — a window, not aggregate-joins (a tot/released join pair
    # stated the report subtree three times; the audit's exchange-storm
    # rule caught it, the close_country_majority lesson exactly).
    wb = Window.partitionBy("source")
    release_rate = F.sum(
        F.when(F.col("reason") == REASON_RELEASE, F.col("frac_batch")).otherwise(0.0)
    ).over(wb)
    return report.select(
        "source",
        "reason",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("frac_batch"), 6).alias("frac_batch"),
        (release_rate < 0.8).alias("suspicious"),
    )


@register(
    "release_metadata_union",
    survey_ref="U1,P4,P5,J1,lookup-recode,pipeline-release,§3.2",
    oracle="""
WITH c AS (
  SELECT CAST(c_custkey AS BIGINT) AS sample_id,
         c_name,
         CAST(c_custkey % 4 AS INT) AS lab,
         CAST(c_custkey % 90 + 10 AS INT) AS zip
  FROM customer
),
-- Four labs deliver four different raw shapes; each conforms to
-- (sample_id, submitter, zip, lab_name) before the union. Lab 3's feed
-- carries no zip at all (NULL after conforming).
conformed AS (
  SELECT sample_id, c_name AS submitter, zip, 'viollier' AS lab_name
  FROM c WHERE lab = 0
  UNION ALL
  SELECT sample_id, lower(c_name), zip, 'imv' FROM c WHERE lab = 1
  UNION ALL
  SELECT sample_id, c_name, zip, 'eoc' FROM c WHERE lab = 2
  UNION ALL
  SELECT sample_id, c_name, CAST(NULL AS INT), 'teamw' FROM c WHERE lab = 3
),
codes(lab_name, foph_code) AS (
  VALUES ('viollier', 101), ('imv', 102), ('eoc', 103), ('teamw', 104)
),
cantons AS (
  SELECT CAST(n_nationkey AS INT) AS canton_key, n_name AS canton FROM nation
)
SELECT m.sample_id,
       m.submitter,
       CAST(cd.foph_code AS INT) AS foph_code,
       coalesce(ct.canton, 'UNKNOWN') AS canton,
       cd.lab_name || '-' || lpad(CAST(m.sample_id AS VARCHAR), 9, '0') AS spsp_id
FROM conformed m
JOIN codes cd USING (lab_name)
LEFT JOIN cantons ct ON ct.canton_key = m.zip % 25
""",
)
def release_metadata_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.2 step 4 — `get_sample_metadata` as one certified query
    (database/R/export_spsp_submission.R:520 onward): the multi-lab
    metadata union (viollier/imv/eoc/teamw arrive with DIFFERENT raw
    shapes and conform to one schema before the union), the FOPH lab-code
    recode (an inline VALUES dim), the zip→canton enrichment join
    (utility.R's plz_to_canton, modeled on the nation dim), the
    `qc_sample_metadata` duplicate-sample hard-stop (dup sample ids abort
    the run — asserted in-plan on the key level), the mandatory-column
    discipline (a lab that never ships zips degrades to canton
    'UNKNOWN' via coalesce rather than dropping rows), and the SPSP
    identifier formatting.

    Labs are customers keyed on c_custkey % 4; lab 1 delivers lowercased
    submitter names (the conform step normalizes shape, not content —
    content normalization is the cascade's job), lab 3 ships no zip.

    Scale shape: one union of four conformed projections (each a
    map-side SELECT over the same scan — Catalyst merges them into one
    pass), two broadcast joins against literal/dimension frames, and the
    hard-stop is a key-level aggregate with take(1). No fact-table
    shuffle anywhere."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("sample_id"),
        "c_name",
        (F.col("c_custkey") % 4).cast("int").alias("lab"),
        (F.col("c_custkey") % 90 + 10).cast("int").alias("zip"),
    )

    def lab(n: int, submitter, zipcol, name: str) -> DataFrame:
        return c.filter(F.col("lab") == n).select(
            "sample_id",
            submitter.alias("submitter"),
            zipcol.cast("int").alias("zip"),
            F.lit(name).alias("lab_name"),
        )

    conformed = (
        lab(0, F.col("c_name"), F.col("zip"), "viollier")
        .unionByName(lab(1, F.lower("c_name"), F.col("zip"), "imv"))
        .unionByName(lab(2, F.col("c_name"), F.col("zip"), "eoc"))
        .unionByName(lab(3, F.col("c_name"), F.lit(None), "teamw"))
    )

    # qc_sample_metadata hard-stop: duplicate sample ids abort the export
    # (the reference raises; we mirror with a key-level check that is
    # empty by construction — c_custkey is the PK).
    dups = conformed.groupBy("sample_id").count().filter(F.col("count") > 1)
    if dups.take(1):
        raise AssertionError("duplicate sample ids in conformed metadata")

    codes = spark.createDataFrame(
        [("viollier", 101), ("imv", 102), ("eoc", 103), ("teamw", 104)],
        "lab_name string, foph_code int",
    )
    cantons = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("canton_key"),
        F.col("n_name").alias("canton"),
    )
    return (
        conformed.join(F.broadcast(codes), "lab_name")
        .join(
            F.broadcast(cantons),
            F.col("canton_key") == F.col("zip") % 25,
            "left",
        )
        .select(
            "sample_id",
            "submitter",
            "foph_code",
            F.coalesce("canton", F.lit("UNKNOWN")).alias("canton"),
            F.concat(
                "lab_name", F.lit("-"), F.lpad(F.col("sample_id").cast("string"), 9, "0")
            ).alias("spsp_id"),
        )
    )
