"""Integration tests: feed-import DAG over two cycles; release cascade."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harvester_database_and_automation_spark.operators.publish import read_published
from harvester_database_and_automation_spark.pipelines import build_release_plan, run_feed_import
from harvester_database_and_automation_spark.pipelines.release import suspicious_batches
from harvester_database_and_automation_spark.sources.quarantine import not_null

FEED_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("sequence", T.StringType()),
        T.StructField("n_mut", T.IntegerType()),  # derived by annotate
    ]
)


def _write_feed(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _annotate(df):
    """Stand-in for the expensive alignment/mutation stage: count 'G's."""
    return df.withColumn(
        "n_mut", F.length("sequence") - F.length(F.regexp_replace("sequence", "G", ""))
    ).select(*[f.name for f in FEED_SCHEMA.fields])


def _run(spark, feed, table):
    return run_feed_import(
        spark,
        feed,
        table,
        FEED_SCHEMA,
        keys=["seq_id"],
        metadata_cols=["country"],
        payload_cols=["sequence"],
        checks={"country_required": not_null("country")},
        annotate=_annotate,
        required_fields={"seq_id", "sequence"},
    )


def test_feed_import_two_cycles(spark, tmp_path):
    feed1 = str(tmp_path / "feed1.jsonl")
    table = str(tmp_path / "seq_table")
    _write_feed(
        feed1,
        [
            {"seq_id": "a", "country": "CH", "sequence": "ACGG"},
            {"seq_id": "b", "country": "DE", "sequence": "TTTT"},
            {"seq_id": "c", "country": None, "sequence": "GGGG"},  # quarantined
        ],
    )
    rep1 = _run(spark, feed1, table)
    assert (rep1.version, rep1.n_insert, rep1.n_quarantined) == (1, 2, 1)
    assert rep1.n_annotated == 2
    t1 = {r["seq_id"]: r for r in read_published(spark, table).collect()}
    assert set(t1) == {"a", "b"} and t1["a"]["n_mut"] == 2

    # Cycle 2: a unchanged, b metadata-only change, d new, b'? no — drop
    # nothing yet... e deletes happen for rows absent from the feed.
    feed2 = str(tmp_path / "feed2.jsonl")
    _write_feed(
        feed2,
        [
            {"seq_id": "a", "country": "CH", "sequence": "ACGG"},   # unchanged
            {"seq_id": "b", "country": "FR", "sequence": "TTTT"},   # metadata only
            {"seq_id": "d", "country": "IT", "sequence": "GGGA"},   # insert
        ],
    )
    rep2 = _run(spark, feed2, table)
    assert rep2.version == 2
    assert (rep2.n_unchanged, rep2.n_metadata_changed, rep2.n_insert, rep2.n_delete) == (1, 1, 1, 0)
    # Annotation ran ONLY for the insert (the skip-reprocessing contract).
    assert rep2.n_annotated == 1
    t2 = {r["seq_id"]: r for r in read_published(spark, table).collect()}
    assert set(t2) == {"a", "b", "d"}
    assert t2["b"]["country"] == "FR"
    assert t2["b"]["n_mut"] == 0  # stored annotation kept, not recomputed
    assert t2["d"]["n_mut"] == 3


def test_feed_import_drift_aborts(spark, tmp_path):
    feed = str(tmp_path / "feed.jsonl")
    _write_feed(feed, [{"seq_id": "a", "country": "CH"}])  # no 'sequence'
    with pytest.raises(ValueError, match="drift"):
        _run(spark, feed, str(tmp_path / "tbl"))


def test_release_cascade_single_reason_and_report(spark):
    df = spark.createDataFrame(
        [
            # (ethid, consensus_n, batch, name)
            ("e1", 10, "b1", "s1"),      # release
            ("e1", 50, "b1", "s2"),      # duplicate (worse)
            ("e2", 999, "b1", "s3"),     # too many Ns
            ("e3", 10, "b2", "s4"),      # release
            ("e4", 998, "b2", "s5"),     # too many Ns -> b2 rate 0.5
        ],
        "ethid string, consensus_n int, batch string, sample_name string",
    )
    annotated, report = build_release_plan(
        df,
        key_col="ethid",
        quality_col="consensus_n",
        batch_col="batch",
        rules=[
            ("duplicate", F.col("duplicate_idx") > 1),
            ("too_many_n", F.col("consensus_n") > 500),
        ],
        tiebreak_col="sample_name",
    )
    reasons = {r["sample_name"]: r["reason"] for r in annotated.collect()}
    assert reasons == {
        "s1": "release",
        "s2": "duplicate",
        "s3": "too_many_n",
        "s4": "release",
        "s5": "too_many_n",
    }
    rep = {(r["batch"], r["reason"]): r["frac_batch"] for r in report.collect()}
    assert rep[("b1", "release")] == pytest.approx(1 / 3)
    assert rep[("b2", "too_many_n")] == pytest.approx(0.5)

    sus = suspicious_batches(report, "batch", threshold=0.8).collect()
    assert {r["batch"] for r in sus} == {"b1", "b2"}


def test_derived_layer_rebuild_dependency_order(spark, tmp_path):
    from harvester_database_and_automation_spark.operators.publish import read_published
    from harvester_database_and_automation_spark.pipelines.derived import LAYER, DerivedLayer

    out = str(tmp_path / "derived")
    versions = LAYER.rebuild(spark, "/root/testdata/sf0.001", out)
    assert set(versions) == set(LAYER.tables)
    assert all(v == 1 for v in versions.values())

    meta = read_published(spark, f"{out}/doc_public_meta")
    proj = read_published(spark, f"{out}/doc_term_projection")
    inten = read_published(spark, f"{out}/lang_term_intensity")
    # Layer 2 only contains best docs from layer 1.
    n_best = meta.filter("is_best").count()
    assert proj.select("doc_id").distinct().count() <= n_best
    # Rollup grand-total row equals the projection row count.
    total = inten.filter("gid = 3").collect()[0]["n"]
    assert total == proj.count()

    # Spine table: grand total equals the event count; no gaps in the spine.
    intensity = read_published(spark, f"{out}/daily_event_intensity")
    from harvester_database_and_automation_spark.catalog import load_table

    n_events = load_table(spark, "/root/testdata/sf0.001", "events").count()
    grand = intensity.filter("gid = 3").collect()[0]["n_events"]
    assert grand == n_events
    n_days = intensity.filter("day is not null and event_type is null").count()
    n_types = intensity.filter("day is not null and event_type is not null").select("event_type").distinct().count()
    assert intensity.count() == n_days * n_types + n_days + 1

    # Dashboard: both kinds present, bad-counts bounded by totals, buckets
    # follow the recode ('0-19', ..., '100+', 'Unknown').
    dash = read_published(spark, f"{out}/weekly_dashboard")
    kinds = {r["kind"] for r in dash.select("kind").distinct().collect()}
    assert kinds == {"event", "order"}
    assert dash.filter("n_bad > n").count() == 0
    buckets = {r["v_bucket"] for r in dash.select("v_bucket").distinct().collect()}
    assert buckets <= {"0-19", "20-39", "40-59", "60-79", "80-99", "100+", "Unknown"}

    # Lineage-mutation MV: labels restricted to the variant set + NONE,
    # every share a valid proportion.
    lmc = read_published(spark, f"{out}/lineage_mutation_counts")
    labels = {r["lineage"] for r in lmc.select("lineage").distinct().collect()}
    assert labels <= {"ALPHA", "BETA", "NONE"}
    assert lmc.filter("share <= 0 or share > 1").count() == 0

    # Second rebuild bumps every version (atomic swap per table).
    versions2 = LAYER.rebuild(spark, "/root/testdata/sf0.001", out)
    assert all(v == 2 for v in versions2.values())

    # Registry validation: unknown dependency rejected.
    layer = DerivedLayer()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown table"):

        @layer.register("x", depends_on=("nope",))
        def x(spark, sf_dir, deps):
            return None


def test_resequencing_decisions(spark):
    """≥10% improvement submits an update; less tombstones; unseen keys
    submit as new — the exact boundary is strict (<0.9x, not <=)."""
    from harvester_database_and_automation_spark.pipelines.release import (
        resequencing_decisions,
    )

    released = spark.createDataFrame(
        [("A", 100), ("A", 120), ("C", 40)], "sample string, n_count int"
    )
    incoming = spark.createDataFrame(
        [("A", 85), ("A", 90), ("A", 95), ("B", 50)], "sample string, n_count int"
    )
    out = {
        (r["sample"], r["n_count"]): r["decision"]
        for r in resequencing_decisions(released, incoming, "sample", "n_count").collect()
    }
    assert out == {
        ("A", 85): "submit_update",  # 85 < 0.9 * 100
        ("A", 90): "tombstone",      # strict boundary: 90 is not < 90
        ("A", 95): "tombstone",
        ("B", 50): "submit_new",
    }


def test_batch_completeness(spark):
    from harvester_database_and_automation_spark.pipelines.release import (
        batch_completeness,
    )

    expected = spark.createDataFrame(
        [("s1", "b1"), ("s2", "b1"), ("s3", "b2"), ("s4", "b2"), ("s5", "b2")],
        "sample string, batch string",
    )
    arrived = spark.createDataFrame([("s1",), ("s2",), ("s3",)], "sample string")
    out = {r["batch"]: r for r in batch_completeness(expected, arrived, "sample", "batch").collect()}
    assert (out["b1"]["n_expected"], out["b1"]["n_missing"], out["b1"]["is_complete"]) == (2, 0, True)
    assert (out["b2"]["n_arrived"], out["b2"]["n_missing"], out["b2"]["is_complete"]) == (1, 2, False)


def test_dedup_hub_tables_match_query_plans(spark, tmp_path):
    """The published dedup hub (shingle index -> scored pairs -> component
    map) must reproduce exactly what the session-cached query plans
    compute — materialization changes cost, never answers."""
    from harvester_database_and_automation_spark.pipelines.derived import LAYER
    from harvester_database_and_automation_spark.plans.text import _jaccard_pairs
    from harvester_database_and_automation_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "derived")
    LAYER.rebuild(spark, sf, out)

    from harvester_database_and_automation_spark.operators.publish import read_published

    pairs_tbl = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in read_published(spark, f"{out}/dup_pairs").collect()
    }
    pairs_qry = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in _jaccard_pairs(spark, sf, 0.1).collect()
    }
    assert pairs_tbl == pairs_qry

    comp_tbl = {
        (r["doc_id"], r["component_id"])
        for r in read_published(spark, f"{out}/dup_components").collect()
    }
    comp_qry = {
        (r["doc_id"], r["component_id"])
        for r in QUERIES["incremental_dup_components"].fn(spark, sf).collect()
    }
    assert comp_tbl == comp_qry


def test_copurchase_edges_table_feeds_graph_queries(spark, tmp_path):
    """The published edge table must equal the edge frame the graph
    queries derive inline (same prune), so production jobs can swap the
    recompute for a read."""
    from harvester_database_and_automation_spark.operators.publish import read_published
    from harvester_database_and_automation_spark.pipelines.derived import LAYER

    out = str(tmp_path / "derived")
    LAYER.rebuild(spark, "/root/testdata/sf0.001", out)
    edges = read_published(spark, f"{out}/copurchase_edges")
    assert edges.filter("pa >= pb").count() == 0
    assert edges.filter("w < 2").count() == 0
    # Triangle counts from the published table match the inline query.
    from pyspark.sql import functions as F

    from harvester_database_and_automation_spark.plans.registry import QUERIES

    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    inline = QUERIES["part_copurchase_triangles"].fn(spark, "/root/testdata/sf0.001")
    inline_total = inline.agg(F.sum("n_triangles")).collect()[0][0] or 0
    assert inline_total == 3 * tris  # each triangle counted once per vertex


def test_read_derived_serving_store(spark, tmp_path, monkeypatch):
    """The serving-store contract: first reader publishes (transitive
    deps included, each through the store), later readers scan the
    published version without bumping it, and an already-published
    version is authoritative (the concurrent-publisher fallback)."""
    import harvester_database_and_automation_spark.pipelines.derived as dv
    from harvester_database_and_automation_spark.operators.publish import (
        current_version,
        publish_versioned,
    )

    monkeypatch.setattr(dv, "_SERVE_ROOT", str(tmp_path / "store"))
    sf = "/root/testdata/sf0.001"

    # First read publishes v1 of dup_pairs AND its dep shingle_index.
    pairs1 = dv.read_derived(spark, sf, "dup_pairs")
    pairs_dir = dv._serve_dir(sf, "dup_pairs")
    dep_dir = dv._serve_dir(sf, "shingle_index")
    assert current_version(pairs_dir) == 1
    assert current_version(dep_dir) == 1
    n1 = pairs1.count()

    # Second read serves the SAME published version — no rebuild, no bump.
    pairs2 = dv.read_derived(spark, sf, "dup_pairs")
    assert current_version(pairs_dir) == 1
    assert pairs2.count() == n1

    # The store key carries the builder-source fingerprint, so a builder
    # change re-keys the directory instead of serving a stale table.
    fp = dv._build_fingerprint("dup_pairs")
    assert pairs_dir.endswith(f"dup_pairs-{fp}")
    assert fp != dv._build_fingerprint("shingle_index")
    # The fingerprint hashes transitive deps too: dup_pairs' key differs
    # from what hashing only its own builder source would give.
    import hashlib
    import inspect

    own_only = hashlib.sha256(
        "\n".join(sorted([inspect.getsource(dv.LAYER.tables["dup_pairs"].build)])).encode()
    ).hexdigest()[:10]
    assert fp != own_only

    # Concurrent-publisher fallback: a table dir that already has a
    # published version is authoritative — read_derived must NOT overwrite
    # it (corpora are immutable, existence == freshness).
    sentinel_dir = dv._serve_dir(sf, "minhash_signatures")
    sentinel = spark.range(3).selectExpr("id AS doc_id")
    publish_versioned(sentinel, sentinel_dir)
    served = dv.read_derived(spark, sf, "minhash_signatures")
    assert current_version(sentinel_dir) == 1
    assert served.count() == 3 and served.columns == ["doc_id"]

    # Corpus fingerprint: a corpus REGENERATED at the same path (the
    # driver rewrites testdata each round) re-keys the store, so stale
    # published tables are never served for new data.
    fake = tmp_path / "corpus"
    fake.mkdir()
    (fake / "t.parquet").write_bytes(b"v1-bytes")
    fp1 = dv._corpus_fingerprint(str(fake))
    dir_before = dv._serve_dir(str(fake), "dup_pairs")
    (fake / "t.parquet").write_bytes(b"regenerated-bytes")
    fp2 = dv._corpus_fingerprint(str(fake))
    dir_after = dv._serve_dir(str(fake), "dup_pairs")
    assert fp1 != fp2
    # The serve directory itself must move with the regeneration — the
    # post-rewrite path carries the NEW fingerprint, not the old one.
    assert dir_before != dir_after
    assert fp1 in dir_before and fp2 in dir_after and fp1 not in dir_after

    # SAME-SIZE regeneration within the same wall-clock second must still
    # re-key (nanosecond mtimes; whole-second truncation aliased this).
    (fake / "t.parquet").write_bytes(b"regenerated-bytez")
    assert dv._corpus_fingerprint(str(fake)) != fp2

    # code_deps: the delegated helper module's source is part of the
    # build fingerprint, so a helper-only edit re-keys the store.
    fp_with = dv._build_fingerprint("semdedup_assign")
    spec = dv.LAYER.tables["semdedup_assign"]
    stripped = dv.DerivedTable(spec.name, spec.build, spec.depends_on, spec.partition_by, ())
    dv.LAYER.tables["semdedup_assign"] = stripped
    try:
        assert dv._build_fingerprint("semdedup_assign") != fp_with
    finally:
        dv.LAYER.tables["semdedup_assign"] = spec


def test_run_release_cycle_two_cycles(spark, tmp_path):
    """End-to-end unit check of the §3.2 cycle runner on a hand-built
    corpus: completeness hold-back, in-cycle duplicate window, the fail
    cascade, both resequencing legs at their exact boundary (old=10:
    new=9 tombstones, new=8 updates), and versioned publish."""
    from harvester_database_and_automation_spark.pipelines.release import run_release_cycle

    table = str(tmp_path / "released")
    expected = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1), (10, 2), (11, 2)],
        "sample_id bigint, batch int",
    )
    rules = [
        ("duplicate", F.col("duplicate_idx") > 1),
        ("too_many_n", F.col("consensus_n") > 90),
    ]

    # Cycle 1: batch 1 incomplete (sample 4 missing); sample 1 has two
    # attempts; sample 2 fails too_many_n; samples 10/11 release at n=10.
    c1 = spark.createDataFrame(
        [(1, 1, 0, 30), (1, 2, 0, 37), (2, 1, 0, 95), (3, 1, 1, 20),
         (10, 1, 2, 10), (11, 1, 2, 10)],
        "sample_id bigint, attempt_id int, batch int, consensus_n int",
    )
    arrived1 = c1.select("sample_id").distinct()
    man1, held1, rep1 = run_release_cycle(
        spark, c1, expected, arrived1, table, rules,
        key="sample_id", quality_col="consensus_n", batch_col="batch",
        tiebreak_col="attempt_id",
    )
    s1 = {(r["sample_id"], r["attempt_id"]): r["status"] for r in man1.collect()}
    assert s1 == {(1, 1): "submit_new", (1, 2): "duplicate", (2, 1): "too_many_n",
                  (3, 1): "held_back", (10, 1): "submit_new", (11, 1): "submit_new"}
    assert {r["duplicate_idx"] for r in man1.filter("status = 'held_back'").collect()} == {None}
    assert [r["sample_id"] for r in held1.collect()] == [3]
    assert rep1.version == 1 and rep1.n_held_back == 1 and rep1.n_submit_new == 3

    # Cycle 2: batch 1 completes (sample 4 arrives) so sample 3 releases;
    # sample 1 resequences with a >10% improvement (26 < 0.9*30 = 27; an
    # exactly-10% attempt would tombstone — the boundary is strict) and
    # samples 10/11 probe it at old=10: 9 is NOT < 0.9*10, 8 is.
    c2 = spark.createDataFrame(
        [(4, 1, 1, 50), (1, 2, 0, 26), (10, 2, 2, 9), (11, 2, 2, 8)],
        "sample_id bigint, attempt_id int, batch int, consensus_n int",
    )
    candidates2 = c2.unionByName(held1.select(*c2.columns))
    arrived2 = arrived1.unionByName(c2.select("sample_id")).distinct()
    man2, held2, rep2 = run_release_cycle(
        spark, candidates2, expected, arrived2, table, rules,
        key="sample_id", quality_col="consensus_n", batch_col="batch",
        tiebreak_col="attempt_id",
    )
    s2 = {r["sample_id"]: r["status"] for r in man2.collect()}
    assert s2 == {4: "submit_new", 3: "submit_new", 1: "submit_update",
                  10: "tombstone", 11: "submit_update"}
    assert held2.count() == 0
    assert rep2.version == 2 and rep2.n_tombstoned == 1 and rep2.n_submit_update == 2

    # The published table carries the updated metric, never tombstoned ones.
    final = {r["sample_id"]: r["consensus_n"] for r in read_published(spark, table).collect()}
    assert final == {1: 26, 3: 20, 4: 50, 10: 10, 11: 8}


def test_run_release_cycle_payload_skinny(spark, tmp_path):
    """payload_cols: wide columns skip the cascade window and re-attach
    only to the accepted delta — published rows carry the RIGHT attempt's
    payload (the accepted (key, tiebreak) pair, not an arbitrary one)."""
    from pyspark.sql import functions as F

    from harvester_database_and_automation_spark.operators.publish import read_published
    from harvester_database_and_automation_spark.pipelines.release import run_release_cycle

    table = str(tmp_path / "released")
    expected = spark.createDataFrame([(1, 0), (2, 0)], "sample_id bigint, batch int")
    rules = [("duplicate", F.col("duplicate_idx") > 1)]
    # Sample 1 has two attempts with DIFFERENT payloads; the better one
    # (lower consensus_n) must be the published payload.
    c1 = spark.createDataFrame(
        [(1, 1, 0, 30, "SEQ-1-ATT-1"), (1, 2, 0, 20, "SEQ-1-ATT-2"), (2, 1, 0, 50, "SEQ-2")],
        "sample_id bigint, attempt_id int, batch int, consensus_n int, payload string",
    )
    man1, held1, rep1 = run_release_cycle(
        spark, c1, expected, c1.select("sample_id"), table, rules,
        key="sample_id", quality_col="consensus_n", batch_col="batch",
        tiebreak_col="attempt_id",
        released_cols=["sample_id", "consensus_n", "payload"],
        payload_cols=["payload"],
    )
    assert rep1.version == 1 and rep1.n_submit_new == 2
    pub = {r["sample_id"]: (r["consensus_n"], r["payload"])
           for r in read_published(spark, table).collect()}
    assert pub == {1: (20, "SEQ-1-ATT-2"), 2: (50, "SEQ-2")}
    # The cascade never saw the payload column: manifest rows carry it
    # only where the raw candidates do (held rows; none here).
    man_cols = set(man1.columns)
    assert "payload" in man_cols  # held leg unions it in (as NULL here)
    assert man1.filter("status <> 'held_back' AND payload IS NOT NULL").count() == 0

    # Cycle 2: a >=10% improvement updates and must swap in the NEW payload.
    c2 = spark.createDataFrame(
        [(1, 3, 0, 10, "SEQ-1-ATT-3")],
        "sample_id bigint, attempt_id int, batch int, consensus_n int, payload string",
    )
    man2, _h, rep2 = run_release_cycle(
        spark, c2, expected, c1.select("sample_id"), table, rules,
        key="sample_id", quality_col="consensus_n", batch_col="batch",
        tiebreak_col="attempt_id",
        released_cols=["sample_id", "consensus_n", "payload"],
        payload_cols=["payload"],
    )
    assert rep2.n_submit_update == 1
    pub2 = {r["sample_id"]: (r["consensus_n"], r["payload"])
            for r in read_published(spark, table).collect()}
    assert pub2 == {1: (10, "SEQ-1-ATT-3"), 2: (50, "SEQ-2")}


def test_run_release_cycle_rejects_inflating_payload_reattach(spark, tmp_path):
    """The accepted-key uniqueness gate runs pre-join; duplicate (key,
    tiebreak) CANDIDATE rows would re-introduce duplicate keys through the
    payload re-attach join after it (round-10 ADVICE). The post-join count
    must catch the inflation before the merge doubles published rows."""
    import pytest
    from pyspark.sql import functions as F

    from harvester_database_and_automation_spark.pipelines.release import run_release_cycle

    table = str(tmp_path / "released")
    expected = spark.createDataFrame([(1, 0)], "sample_id bigint, batch int")
    rules = [("duplicate", F.col("duplicate_idx") > 1)]
    # Two candidate rows share (sample_id=1, attempt_id=1): the window
    # dedups them to ONE accepted row (gate passes), but the (key,
    # tiebreak) payload join matches BOTH raw rows.
    c1 = spark.createDataFrame(
        [(1, 1, 0, 30, "PAYLOAD-A"), (1, 1, 0, 30, "PAYLOAD-B")],
        "sample_id bigint, attempt_id int, batch int, consensus_n int, payload string",
    )
    with pytest.raises(ValueError, match="re-attach"):
        run_release_cycle(
            spark, c1, expected, c1.select("sample_id"), table, rules,
            key="sample_id", quality_col="consensus_n", batch_col="batch",
            tiebreak_col="attempt_id",
            released_cols=["sample_id", "consensus_n", "payload"],
            payload_cols=["payload"],
        )


def test_run_release_cycle_rejects_duplicate_accepted_keys(spark, tmp_path):
    """Rules that fail to deduplicate (no duplicate_idx rule) must fail
    LOUDLY before the merge, not silently double published rows."""
    import pytest
    from pyspark.sql import functions as F

    from harvester_database_and_automation_spark.pipelines.release import run_release_cycle

    table = str(tmp_path / "released")
    expected = spark.createDataFrame([(1, 0)], "sample_id bigint, batch int")
    c1 = spark.createDataFrame(
        [(1, 1, 0, 30), (1, 2, 0, 20)],
        "sample_id bigint, attempt_id int, batch int, consensus_n int",
    )
    with pytest.raises(ValueError, match="duplicate"):
        run_release_cycle(
            spark, c1, expected, c1.select("sample_id"), table, [],
            key="sample_id", quality_col="consensus_n", batch_col="batch",
            tiebreak_col="attempt_id",
        )
