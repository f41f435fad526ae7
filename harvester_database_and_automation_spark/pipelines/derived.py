"""The derived-table cascade — Spark re-design of the cov-spectrum
materialized-view layer (SURVEY.md §3.3; database/sql/spectrum/
sequences_gisaid_api_based.sql:22-521, refreshes.sql:3-36).

The reference refreshes 8 materialized views after every ingest. Here a
derived table is a named function over the base corpus plus previously
built derived tables; ``rebuild`` walks the registry in dependency order
and atomically publishes each via the versioned-directory swap — readers
of table N never see a state where N is newer than its inputs unless the
build completed.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.catalog import load_table
from harvester_database_and_automation_spark.operators.publish import (
    partition_leaves,
    publish_incremental,
    publish_versioned,
    read_published,
)


@dataclass(frozen=True)
class DerivedTable:
    name: str
    build: Callable[[SparkSession, str, dict[str, DataFrame]], DataFrame]
    depends_on: tuple[str, ...] = ()
    partition_by: tuple[str, ...] = ()
    # Package modules (dotted, relative to this package) whose code the
    # builder DELEGATES to — a one-line `return _helper(spark, sf_dir)`
    # builder re-keys the serving store only if the helper's module is
    # fingerprinted too. Whole-module hashing is deliberately coarse: an
    # unrelated edit in the module costs one spurious rebuild (seconds),
    # while an uncaptured helper edit would serve a STALE table against a
    # freshly-changed oracle — a correctness bug.
    code_deps: tuple[str, ...] = ()


@dataclass
class DerivedLayer:
    tables: dict[str, DerivedTable] = field(default_factory=dict)

    def register(
        self,
        name: str,
        depends_on: tuple[str, ...] = (),
        partition_by: tuple[str, ...] = (),
        code_deps: tuple[str, ...] = (),
    ):
        def deco(fn):
            if name in self.tables:
                raise ValueError(f"duplicate derived table {name!r}")
            for dep in depends_on:
                if dep not in self.tables:
                    raise ValueError(f"{name!r} depends on unknown table {dep!r}")
            self.tables[name] = DerivedTable(name, fn, depends_on, partition_by, code_deps)
            return fn

        return deco

    def rebuild(
        self,
        spark: SparkSession,
        sf_dir: str,
        out_root: str,
        only: set[str] | None = None,
    ) -> dict[str, int]:
        """Build every derived table in registration (= dependency) order,
        publishing each atomically. Returns {table: version}. ``only``
        scopes the walk to the named tables plus their transitive deps
        (a partial refresh — e.g. the parity certification rebuilds just
        the partitioned tables it compares)."""
        wanted: set[str] | None = None
        if only is not None:
            wanted = set()
            stack = list(only)
            while stack:
                n = stack.pop()
                if n in wanted:
                    continue
                wanted.add(n)
                stack.extend(self.tables[n].depends_on)
        built: dict[str, DataFrame] = {}
        versions: dict[str, int] = {}

        def one(name: str) -> tuple[str, int]:
            spec = self.tables[name]
            deps = {d: built[d] for d in spec.depends_on}
            df = spec.build(spark, sf_dir, deps)
            return name, publish_versioned(
                df, os.path.join(out_root, name), partition_by=list(spec.partition_by) or None
            )

        # Dependency-LEVEL scheduling with a small thread pool: tables in
        # the same level are independent builds writing distinct dirs, and
        # Spark happily runs their jobs concurrently — the next build's
        # tasks back-fill executors idling in the previous build's
        # straggler tail and driver-side publish/listing gaps (guide on
        # overlapping independent jobs). Results are identical: each table
        # still builds from fully-published deps.
        remaining = [n for n in self.tables if wanted is None or n in wanted]
        while remaining:
            ready = [
                n for n in remaining if all(d in built for d in self.tables[n].depends_on)
            ]
            if not ready:
                raise ValueError(f"dependency cycle among {remaining!r}")
            if len(ready) == 1:
                results = [one(ready[0])]
            else:
                with ThreadPoolExecutor(max_workers=min(4, len(ready))) as pool:
                    results = list(pool.map(one, ready))
            for name, v in results:
                versions[name] = v
                built[name] = read_published(spark, os.path.join(out_root, name))
            remaining = [n for n in remaining if n not in versions]
        return versions

    def rebuild_incremental(
        self, spark: SparkSession, sf_dir: str, out_root: str, predicates: dict[str, Column]
    ) -> dict[str, int]:
        """Rebuild ONLY the partitions matching each table's predicate —
        the SURVEY.md §4 incremental-maintenance design: the build stays the
        same declarative full-table plan, the predicate prunes it down to
        the churned partitions (Catalyst pushes it into the scans), and
        ``publish_incremental`` carries every other partition over to the
        new version without rewriting it.

        Tables absent from ``predicates`` are untouched; listed tables must
        have been registered with ``partition_by`` and published before.

        The predicate SELECTS DIRTY PARTITIONS, it does not filter rows:
        the rebuilt partitions always contain every row the full build
        would put there (the predicate's matching rows pick the partition
        keys, then the unfiltered build is semi-joined to those keys), so
        a row-level churn predicate can never silently drop the
        non-matching rows of a touched partition.
        """
        for name in predicates:
            if not self.tables[name].partition_by:
                raise ValueError(f"{name!r} has no partition_by; register one to rebuild incrementally")

        def one(name: str) -> tuple[str, int]:
            spec = self.tables[name]
            deps = {d: read_published(spark, os.path.join(out_root, d)) for d in spec.depends_on}
            full = spec.build(spark, sf_dir, deps)
            pcols = list(spec.partition_by)
            # Dirty-key selection runs as its own bounded action (partition
            # keys only — the same cardinality partition_leaves already
            # collects below), and the rebuild filters on the IN-list
            # instead of semi-joining the build against itself: the former
            # semi-join planted the whole build subtree TWICE in one plan
            # (once under the distinct, once as the probe side), so every
            # incremental rebuild executed the expensive derivation two
            # times; the literal filter executes it once AND pushes the
            # partition predicate into the dep scans. Null partition keys
            # never matched the null-unsafe semi-join either, so dropping
            # them from the IN-list preserves row-for-row semantics.
            dirty_rows = full.filter(predicates[name]).select(*pcols).distinct().collect()
            keep = [tuple(r[c] for c in pcols) for r in dirty_rows]
            keep = [t for t in keep if all(v is not None for v in t)]
            if not keep:
                cond = F.lit(False)
            elif len(pcols) == 1:
                cond = F.col(pcols[0]).isin([t[0] for t in keep])
            else:
                cond = F.lit(False)
                for t in keep:
                    match = F.lit(True)
                    for c, v in zip(pcols, t):
                        match = match & (F.col(c) == F.lit(v))
                    cond = cond | match
            df = full.filter(cond)
            # Every previous-version partition the predicate matches is up
            # for replacement: the ones the new build still produces get
            # written fresh, and the ones whose keys vanished from the
            # source must NOT be hard-linked forward — otherwise the
            # incremental rebuild diverges from a full rebuild.
            try:
                prior = read_published(spark, os.path.join(out_root, name))
                stale = partition_leaves(
                    prior.filter(predicates[name]), list(spec.partition_by)
                )
            except FileNotFoundError:
                stale = []  # first publish: nothing to carry over or drop
            return name, publish_incremental(
                df,
                os.path.join(out_root, name),
                partition_by=list(spec.partition_by),
                drop_partitions=stale,
            )

        # Listed tables with no listed dependency between them are
        # independent (each reads only PUBLISHED deps), so their rebuild
        # jobs overlap in the scheduler — same back-filling rationale as
        # ``rebuild``. A listed table that depends on another listed table
        # still waits for that dep's fresh version, preserving the
        # sequential walk's ordering.
        versions: dict[str, int] = {}
        remaining = [n for n in self.tables if n in predicates]
        while remaining:
            ready = [
                n
                for n in remaining
                if not any(d in remaining for d in self.tables[n].depends_on)
            ]
            if len(ready) == 1:
                results = [one(ready[0])]
            else:
                with ThreadPoolExecutor(max_workers=min(4, len(ready))) as pool:
                    results = list(pool.map(one, ready))
            versions.update(dict(results))
            remaining = [n for n in remaining if n not in versions]
        return versions


# ---------------------------------------------------------------------------
# The demo cascade over the synthetic corpus — same shapes as the spectrum
# layer: conformed union + window dedup -> projection -> spine rollup.
# ---------------------------------------------------------------------------
LAYER = DerivedLayer()


@LAYER.register("doc_public_meta")
def doc_public_meta(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 1 — conformed, deduplicated document metadata (the
    spectrum_sequence_public_meta analog: union of sources, best-per-key
    window dedup, release-aware naming)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn("is_best", F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "is_best")
    )


@LAYER.register("doc_term_projection", depends_on=("doc_public_meta",), partition_by=("lang",))
def doc_term_projection(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 2 — long-format term table for best docs only (the mutation
    projection analog: explode from the deduped layer, not the raw feed)."""
    docs = load_table(spark, sf_dir, "documents")
    best = deps["doc_public_meta"].filter("is_best").select("doc_id")
    return (
        docs.join(best, "doc_id", "left_semi")
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.length("term") >= 6)
    )


@LAYER.register("lang_term_intensity", depends_on=("doc_term_projection",))
def lang_term_intensity(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 3 — rollup counts per (lang, term) with totals row (the
    date-spine × country intensity rollup analog)."""
    terms = deps["doc_term_projection"]
    # grouping_id (0=detail, 1=lang subtotal, 3=grand total) distinguishes
    # subtotal markers from genuinely-null group values — a null-lang data
    # row must neither be dropped nor collide with the grand-total row.
    return terms.rollup("lang", "term").agg(
        F.count(F.lit(1)).alias("n"), F.grouping_id().cast("int").alias("gid")
    )


@LAYER.register("weekly_dashboard", code_deps=("functions.recode",))
def weekly_dashboard(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """The dashboard_main_view analog (init.sql:783-948): two sources
    conformed and unioned (cases+tests there; events+orders here), value
    binning (the age-group recode), and conditional aggregation per
    (iso-week, kind, bucket)."""
    from harvester_database_and_automation_spark.functions.recode import age_group

    ev = load_table(spark, sf_dir, "events").select(
        F.lit("event").alias("kind"),
        F.col("user_id").alias("subject"),
        F.col("ts").alias("t"),
        F.col("value").alias("v"),
        (F.col("event_type") == "error").alias("is_bad"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"),
        F.col("o_custkey").alias("subject"),
        F.col("o_orderdate").alias("t"),
        (F.col("o_totalprice") / 1000).alias("v"),
        (F.col("o_orderstatus") == "F").alias("is_bad"),
    )
    unioned = ev.unionByName(orders)
    return (
        unioned.groupBy(
            F.expr("extract(YEAROFWEEK FROM t)").cast("int").alias("yr"),
            F.weekofyear("t").cast("int").alias("wk"),
            "kind",
            age_group(F.col("v"), width=20, top=100).alias("v_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("is_bad"), 1).otherwise(0)).alias("n_bad"),
            F.countDistinct("subject").alias("n_subjects"),
        )
    )


@LAYER.register("daily_event_intensity")
def daily_event_intensity(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 4 — zero-filled date-spine × event-type counts with rollup
    subtotals: the spectrum_sequence_intensity table itself
    (sequences_gisaid_api_based.sql:384-427). Same plan as the
    ``intensity_spine_rollup`` registered query, published as a table so
    downstream dashboards read the materialization, not the recompute."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"), "event_type"
    )
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    filled = (
        spine.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )
    return filled.rollup("day", "event_type").agg(
        F.sum("n").alias("n_events"), F.grouping_id().cast("int").alias("gid")
    )


@LAYER.register("lineage_mutation_counts", partition_by=("lang",), code_deps=("plans.kernels",))
def lineage_mutation_counts_table(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 5 — the spectrum_pangolin_lineage_mutation MV family
    (sequences_gisaid_api_based.sql:435-471): mutation counts + share per
    (lang, lineage, mutation). Materializing it here is what collapses the
    registered query's recompute exchanges into a single build per ingest —
    exactly why the reference keeps these as materialized views."""
    from harvester_database_and_automation_spark.plans.kernels import (
        lineage_mutation_counts,
    )

    return lineage_mutation_counts(spark, sf_dir)


# ---------------------------------------------------------------------------
# Dedup hub tables — the session-cached frames of plans/text.py published
# as real tables. This is the deployment shape the cache mirrors: shingle
# index, MinHash signature table, scored pair table, component map —
# rebuilt per ingest (incrementally via the churn predicate), consumed by
# every dedup query without re-deriving the explode/join.
# ---------------------------------------------------------------------------
@LAYER.register("shingle_index", code_deps=("plans.text",))
def shingle_index(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — (doc_id, shingle_digest): the inverted-index hub of the
    dedup family, digests only so the table never carries text."""
    from harvester_database_and_automation_spark.plans.text import _shingles

    return _shingles(spark, sf_dir).select("doc_id", F.md5("shingle").alias("shingle_digest"))


@LAYER.register("minhash_signatures", code_deps=("plans.text",))
def minhash_signatures(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — per-doc 16-component MinHash signature table (what a
    dedup service keys its LSH banding off between ingests)."""
    from harvester_database_and_automation_spark.plans.text import _minhash_sigs

    return _minhash_sigs(spark, sf_dir)


@LAYER.register("dup_pairs", depends_on=("shingle_index",))
def dup_pairs(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 7 — scored near-dup pairs (Jaccard >= 0.1) built from the
    PUBLISHED shingle index, not a recompute: the inverted-index self-join
    reads digests only. Downstream thresholds slice this table (pair
    report at 0.1, clustering edges at 0.5)."""
    sh = deps["shingle_index"]
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle_digest") == F.col("b.shingle_digest"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") * 1.0 / (F.col("s1.sz") + F.col("s2.sz") - F.col("n_common"))
    return (
        inter.join(sizes.alias("s1"), F.col("doc_a") == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), F.col("doc_b") == F.col("s2.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.1)
    )


@LAYER.register("ivf_index", code_deps=("plans.embeddings",))
def ivf_index(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — the ANN inverted file (vec_id, cid, sim, rk): per-vector
    centroid similarities with assignment rank, the table a vector store
    rebuilds only when centroids move. The probe and recall queries read
    this through the session cache locally; published here it serves them
    across jobs."""
    from harvester_database_and_automation_spark.plans.embeddings import _ivf_ranked

    return _ivf_ranked(spark, sf_dir)


@LAYER.register("dup_components", depends_on=("dup_pairs",), code_deps=("operators.components",))
def dup_components(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 8 — the published (doc_id, component_id) map over the 0.5
    edge slice of dup_pairs; the table `incremental_components` maintains
    between full rebuilds."""
    from harvester_database_and_automation_spark.operators.components import (
        alternating_star_components,
    )

    edges = deps["dup_pairs"].filter(F.col("jaccard") >= 0.5).select("doc_a", "doc_b")
    labels = alternating_star_components(edges, src="doc_a", dst="doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(labels, docs.doc_id == labels.node, "left").select(
        "doc_id", F.coalesce("component_id", "doc_id").alias("component_id")
    )


@LAYER.register("mutation_table", code_deps=("plans.kernels",))
def mutation_table(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — the exploded (doc_id, pos, base) mutation triple table,
    the hub of the kernel family. The reference MATERIALIZES exactly this
    relation (consensus_sequence_mutation_nucleotide, init.sql:403-410)
    and rebuilds it per ingest; published here it serves K3/K4's
    distance-batch queries without re-deriving the explode per consumer
    (K1 and the lineage-counts table keep the inline build as the
    end-to-end certification of the derivation itself)."""
    from harvester_database_and_automation_spark.plans.kernels import _mutations

    _, muts, _ = _mutations(spark, sf_dir)
    return muts


@LAYER.register("winnow_fingerprints", code_deps=("plans.text",))
def winnow_fingerprints(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — the winnow fingerprint frame (doc_id, block, fp): the
    inverted-index input of the substring-overlap dedup signal. A dedup
    service persists fingerprints per ingest and pairs against the stored
    table; `doc_winnow_fingerprints` keeps the inline rolling-hash build
    as the derivation certification."""
    from harvester_database_and_automation_spark.plans.text import _winnow_fps

    return _winnow_fps(spark, sf_dir)


@LAYER.register("pq_recon", code_deps=("plans.embeddings",))
def pq_recon(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — per-vector PQ reconstructions (vec_id, rv): the decode of
    the stored 8-byte PQ codes against the broadcast codebook. In a vector
    store the codes table is the persisted artifact; publishing the decoded
    frame serves the composed IVF-PQ probe the same way (the flat
    `pq_adc_topk` keeps the inline encode as the recall certification)."""
    from harvester_database_and_automation_spark.plans.embeddings import _pq_recon

    return _pq_recon(spark, sf_dir)


@LAYER.register("kmv_sketches")
def kmv_sketches(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — per-segment KMV sketches: the 64 smallest key hashes per
    order-priority segment, ≤64 (segment, hv) rows each. Mergeability is
    the point of the sketch: any union of segments is estimable from the
    published 64-double rows alone, no raw re-scan — so a sketch service
    maintains exactly this table per ingest. Top-64 per segment is a
    TWO-LEVEL bounded window (per (segment, hash-sub-bucket) top-64, then
    per segment over the ≤64·256 survivors) so no task ever sorts a
    segment's full distinct-key set; the global per-segment top-64 is
    preserved exactly because every global winner survives its
    sub-bucket's local cut."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    keys = o.select(
        F.col("o_orderpriority").alias("segment"), "o_custkey"
    ).distinct()
    hv = (
        F.expr("cast(conv(substr(md5(cast(o_custkey as string)), 1, 15), 16, 10) as bigint)")
        / F.lit(1152921504606846976).cast("double")
    )
    hashed = keys.select("segment", hv.alias("hv"))
    sub = F.pmod(F.crc32(F.col("hv").cast("string")), F.lit(256))
    w1 = Window.partitionBy("segment", "sub").orderBy("hv")
    lvl1 = (
        hashed.withColumn("sub", sub)
        .withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= 64)
        .drop("rk", "sub")
    )
    w2 = Window.partitionBy("segment").orderBy("hv")
    return (
        lvl1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 64)
        .drop("rk")
    )


@LAYER.register(
    "semdedup_assign", partition_by=("cell_bucket",), code_deps=("plans.embeddings",)
)
def semdedup_assign(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — the SemDeDup cell assignment (vec_id, cell, vec, norm,
    cell_bucket): the three-level tree-descent assignment runs once per
    ingest and the within-cell pair scan (`semantic_dedup_served`) reads
    the published frame — the assignment cost moves off the query path.
    Published partitioned by a 16-way cell bucket (cells hash-folded so
    the partition count stays constant as k = N/250 grows): a dedup
    review that re-scores churned cells scans only their buckets, and
    the incremental rebuild path can overwrite per bucket — the same
    partitioning-replaces-indexes serving shape as the lang-partitioned
    tables (SURVEY §4)."""
    from harvester_database_and_automation_spark.plans.embeddings import (
        _semdedup_members,
    )

    return _semdedup_members(spark, sf_dir).withColumn(
        "cell_bucket", F.pmod(F.col("cell"), F.lit(16)).cast("int")
    )


@LAYER.register("copurchase_edges", code_deps=("plans.text",))
def copurchase_edges(spark: SparkSession, sf_dir: str, deps) -> DataFrame:
    """Layer 6 — the weighted part co-purchase edge list (pa < pb, weight
    = co-occurring orders, pruned at weight >= 2): the graph hub that
    `part_copurchase_pagerank` and `part_copurchase_triangles` derive
    inline under the oracle gate. Published, the basket pair expansion
    (the expensive map-side step) runs once per ingest; rank/triangle
    jobs read int pairs."""
    from harvester_database_and_automation_spark.plans.text import _copurchase_edges

    return _copurchase_edges(spark, sf_dir)


# ---------------------------------------------------------------------------
# Serving store: consumers read the MAINTAINED derived table, they do not
# recompute it. This is the deployment shape every "materialized in
# production" claim in scripts/audit_plans.py makes — the reference's MV
# serving layer (sequences_gisaid_api_based.sql:22-113 is read, not
# rebuilt, per query) — made real for registered queries: the first
# reader of a (corpus, table) pair publishes it once via the versioned
# protocol; every later plan is a parquet scan of the published version.
# ---------------------------------------------------------------------------
_SERVE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".derived",
)


def _build_fingerprint(name: str) -> str:
    """Short hash over the builder source of ``name``, its transitive
    deps, AND the full source of every ``code_deps`` module in the chain,
    so a code change to any builder — or to the plans/operators helper a
    one-line builder delegates to — republishes rather than serving a
    stale table across rounds. Module-level hashing captures the
    helper's own intra-module helpers too; helpers in modules NOT named
    by any code_deps (catalog, shared) still need a manual store wipe."""
    import hashlib
    import importlib
    import inspect

    parts: list[str] = []
    stack = [name]
    seen: set[str] = set()
    mods: set[str] = set()
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        spec = LAYER.tables[n]
        parts.append(inspect.getsource(spec.build))
        mods.update(spec.code_deps)
        stack.extend(spec.depends_on)
    pkg = __name__.rsplit(".", 2)[0]  # harvester_database_and_automation_spark
    for mod in sorted(mods):
        parts.append(inspect.getsource(importlib.import_module(f"{pkg}.{mod}")))
    return hashlib.sha256("\n".join(sorted(parts)).encode()).hexdigest()[:10]


def _corpus_fingerprint(sf_dir: str) -> str:
    """Short hash over (relative path, size, mtime_ns) of every parquet
    file under ``sf_dir``. A corpus REGENERATED AT THE SAME PATH (the
    driver rewrites /root/testdata each round) must not be served another
    corpus's published tables — the path alone is not an identity. Sizes
    and mtimes change on regeneration, so the store re-keys and the first
    reader rebuilds; a byte-identical copy at most costs one spurious
    rebuild. Nanosecond mtimes: a small deterministic fixture can be
    regenerated same-size within one SECOND, which whole-second
    truncation would silently alias to the previous corpus."""
    import hashlib

    entries: list[str] = []
    root = os.path.abspath(sf_dir)
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            entries.append(f"{os.path.relpath(p, root)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()[:10]


def _serve_dir(sf_dir: str, name: str) -> str:
    tag = os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "__")
    return os.path.join(
        _SERVE_ROOT,
        f"{tag}-{_corpus_fingerprint(sf_dir)}",
        f"{name}-{_build_fingerprint(name)}",
    )


def read_derived(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read derived table ``name`` for the corpus at ``sf_dir`` from the
    published serving store, building and publishing it (and its
    transitive deps, each from the PUBLISHED layer below) once per
    (corpus-content, builder-version). Freshness is structural: the
    store directory is keyed by a corpus fingerprint (file sizes +
    mtimes — a corpus regenerated at the same path re-keys) AND a
    builder-source fingerprint (code changes re-key), so existence of
    a published version IS the freshness check."""
    spec = LAYER.tables[name]
    table_dir = _serve_dir(sf_dir, name)
    try:
        return read_published(spark, table_dir)
    except FileNotFoundError:
        pass
    deps = {d: read_derived(spark, sf_dir, d) for d in spec.depends_on}
    df = spec.build(spark, sf_dir, deps)
    try:
        publish_versioned(df, table_dir, partition_by=list(spec.partition_by) or None)
    except Exception:
        # Only a concurrent publisher winning the version directory is
        # recoverable (its marker is authoritative — read what it
        # published). Any other publish failure (disk full, schema error,
        # interrupted write) leaves NO current version; re-raising here
        # keeps the root cause instead of a misleading FileNotFoundError
        # from the follow-up read.
        from harvester_database_and_automation_spark.operators.publish import (
            current_version,
        )

        if current_version(table_dir) is None:
            raise
    return read_published(spark, table_dir)
