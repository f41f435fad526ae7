"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark_query, duckdb_oracle_sql) pair over the synthetic corpus.

Importing this package populates the registry.
"""

from harvester_database_and_automation_spark.plans.registry import QUERIES, oracle_sql_map, queries_map

# Import for registration side effects.
from harvester_database_and_automation_spark.plans import relational  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import text  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import embeddings  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import kernels  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import multimodal  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import governance  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import curation  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import streaming_replay  # noqa: E402,F401
from harvester_database_and_automation_spark.plans import external_integration  # noqa: E402,F401

# The driver's correctness artifact records the first N registered queries
# (round 1 captured exactly 50, in registration order). Rotate so the
# LEAST-VERIFIED queries run first: count each query's green rows across
# every CORRECTNESS_r*.json the driver has produced so far and sort
# ascending (stable, so registration order breaks ties). Each round's
# capped window then covers exactly the queries with the fewest
# driver-verified entries — across rounds every query accumulates a green
# row with no manual bookkeeping.


def _green_counts() -> dict[str, int]:
    import json
    from pathlib import Path

    counts: dict[str, int] = {}
    repo = Path(__file__).resolve().parents[2]
    for artifact in sorted(repo.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(artifact.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("schema_match"):
                counts[name] = counts.get(name, 0) + 1
    return counts


def _judge_only_verified() -> set[str]:
    """Queries the round-1 JUDGE re-ran green but the driver's capped
    artifact never recorded: registered at round 1 (they appear in
    BENCH_r01.json's per-query timings) yet absent from CORRECTNESS_r01.
    They carry weaker evidence than a driver row but stronger than none,
    so rotation seats them after the never-anywhere-verified queries."""
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    try:
        bench = json.loads((repo / "BENCH_r01.json").read_text())
        correct = set(json.loads((repo / "CORRECTNESS_r01.json").read_text()))
    except (OSError, ValueError):
        return set()
    # The artifact stores the bench stdout's (front-truncated) tail, not
    # parsed JSON — recover query names from the '"name": seconds' pairs.
    # A name clipped by the truncation simply won't match any registered
    # query, which errs toward treating it as unverified (safe).
    tail = bench.get("tail", "") or ""
    r1_queries = set(re.findall(r'"(\w+)": [0-9.]+[,}]', tail))
    return r1_queries - correct


# Queries whose round-1 verdict explicitly asked for a hash-matched driver
# row (they were rows-only then; both have full oracles now). Seat them at
# the head until a CORRECTNESS artifact shows them green, then the normal
# least-verified rotation takes over.
_PINNED_UNTIL_GREEN = ["k6_geo_rules", "media_decode_stats"]


def _longest_waiting() -> set[str]:
    """Queries registered in a PRIOR round — when tied on zero driver
    greens, they outrank queries first registered THIS round: the
    driver's capped window should clear the oldest evidence gap first; a
    brand-new query always gets the judge's own re-run in its debut
    round anyway. The prior inventory comes from FROZEN per-round
    snapshots (rotation_inventory_r*.json, written from the round-end
    commit), NOT the rolling BENCH_FULL.json — a mid-round bench refresh
    would otherwise promote same-round registrations into the 'waiting
    longest' tier and displace genuinely older queries from the window."""
    import json
    from pathlib import Path

    here = Path(__file__).resolve().parent
    names: set[str] = set()
    for snap in sorted(here.glob("rotation_inventory_r*.json")):
        try:
            names |= set(json.loads(snap.read_text()).get("queries", []))
        except (OSError, ValueError):
            continue
    return names


# Queries whose IMPLEMENTATION changed in round 3 after earning a green
# row: their r01/r02 evidence certifies the OLD plan (modulus query
# samples, fixed 8-cell SemDeDup, holistic percentile buffers, int64
# slope products, hint/ordering changes). They re-enter the rotation
# right AFTER the never-verified tier until an artifact from round >= 3
# shows the current code green; the judge's own re-run covers them in
# the meantime.
_CHANGED_IN_R3 = [
    "lineitem_column_profile",
    "order_value_percentiles",
    "event_value_trend",
    "prefix_filter_jaccard_pairs",
    "simhash_hamming_pairs",
    "ivf_topk_probe",
    "ivf_recall_at_3",
    "pq_adc_topk",
    "semantic_dedup_cells",
]

# Queries whose IMPLEMENTATION changed in round 5 after earning a green
# row (sampled near-dup baseline, two-level SemDeDup assignment, binned
# percentiles, Spark-spooled router feed, strict one-pass round-trips,
# AQE-decides tfidf join, guarded interval explode). They re-enter the
# rotation until an artifact from round >= 5 shows the current code
# green.
_CHANGED_IN_R5 = [
    "embedding_near_dup_pairs",
    "semantic_dedup_cells",
    "order_value_percentiles",
    "tfidf_top_terms",
    "streaming_change_router_replay",
    "csv_typed_roundtrip",
    "chunked_export_roundtrip",
    "signup_purchase_window_join",
    # Bounded-batch reworks after the full-registry 100x curve exposed
    # their modulus samples as corpus-proportional (O(N^2) pair scans):
    "k3_origin_estimator",
    "k4_priority_scorer",
    "knn_label_predict",
    "a11_mean_hamming",
]

# Queries whose IMPLEMENTATION changed in round 6 after earning a green
# row (adaptive per-key salt in the skew operator; the near-dup pair
# report repointed to the published dup_pairs derived table; the
# SemDeDup argmin helper now carries payloads inside the min-struct).
# They re-enter the rotation until an artifact from round >= 6 shows
# the current code green.
_CHANGED_IN_R6 = [
    "hot_band_pair_stress",
    "ngram_jaccard_pairs",
    "semantic_dedup_cells",
    # read_csv_strict now forces full-row parsing (pruning caveat fix):
    "csv_typed_roundtrip",
    "chunked_export_roundtrip",
    # Fixed-size hash-drawn query/anchor batches (were corpus-proportional
    # % 13 slices — the same O(N^2) sample defect class as the round-5
    # kernel reworks, exposed by the refreshed 100x curve):
    "ivf_topk_probe",
    "contrastive_negative_sample",
]


# Queries whose shared replay machinery changed in round 8 AFTER their
# last driver green (d6c5aab/56ec67f rewrote _stream_state_partitions(4),
# the _spool_batches parent persist, and the foreachBatch append sinks
# that all seven streaming replays flow through; these four had only
# pre-trim driver greens — r5/r7 — when round 8 ended). The builder
# re-certified every hash at sf0.01+sf0.1 after each change, but the
# driver's own rotation must re-hash the current implementations.
_CHANGED_IN_R8 = [
    "streaming_change_router_replay",
    "streaming_dedup_replay",
    "streaming_watermark_window_replay",
    "streaming_upsert_publish_replay",
]

# Round-9 edits after round 8's driver greens: the feed_import_replay
# oracle gained the explicit source-IS-NOT-NULL quarantine predicate
# (r8 ADVICE); the feed-import/upsert write path moved from full-outer
# merge_upsert to the payload-skinny classify + merge_delta shape (no
# corpus exchange); event_value_trend gained the zero-variance slope
# guard the drift guard exposed.
_CHANGED_IN_R9 = [
    "feed_import_replay",
    "streaming_upsert_publish_replay",
    # Zero-variance /0 guards the drift guard exposed (NULL on degenerate
    # denominators, mirrored in the oracles):
    "event_value_trend",
    "order_price_date_correlation",
    "ab_arm_zscores",
]

# Round-10 edits after round 9's driver greens: merge_delta gained
# delete-wins precedence on update/tombstone overlap; feed_import's
# broadcast gates became byte-aware (the width estimate rides the
# classification rollup, changing its aggregate); run_release_cycle
# gained the accepted-uniqueness assertion + measured-delta broadcast
# hint + derived first-cycle schema (+ the payload-skinny cascade path);
# the streaming upsert sink measures each micro-batch and hints its
# merge; run_fasta_tool was refactored for the per-batch quarantine mode
# (fail-mode semantics unchanged, but the S8 stage is a new
# implementation).
_CHANGED_IN_R10 = [
    "feed_import_replay",
    "release_export_replay",
    "streaming_upsert_publish_replay",
    "external_tool_seq_stats",
]

# Round-11 edits after round 10's driver greens: run_release_cycle's
# payload re-attach join gained the post-join 1:1 hard-stop against the
# gated accepted count (duplicate (key,tiebreak) candidates previously
# re-inflated the delta AFTER the uniqueness gate) and the re-attach
# frame is now cached across the count + merge.
_CHANGED_IN_R11 = [
    "release_export_replay",
]

# round -> list; a query whose latest implementation-change round has no
# green row at-or-after that round re-enters the rotation's tier 2.
_CHANGED_IN = {
    3: _CHANGED_IN_R3,
    5: _CHANGED_IN_R5,
    6: _CHANGED_IN_R6,
    8: _CHANGED_IN_R8,
    9: _CHANGED_IN_R9,
    10: _CHANGED_IN_R10,
    11: _CHANGED_IN_R11,
}


def _green_counts_since(round_no: int) -> dict[str, int]:
    import json
    import re as _re
    from pathlib import Path

    counts: dict[str, int] = {}
    repo = Path(__file__).resolve().parents[2]
    for artifact in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"r(\d+)", artifact.name)
        if not m or int(m.group(1)) < round_no:
            continue
        try:
            data = json.loads(artifact.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("schema_match"):
                counts[name] = counts.get(name, 0) + 1
    return counts


# Evidence-staleness bound (r9 verdict ask #4): a query whose latest
# driver green is MORE than this many rounds old is seated ahead of the
# steady-state rotation until the driver re-hashes it.
MAX_GREEN_AGE_ROUNDS = 5


def latest_green_round() -> dict[str, int]:
    """Per query, the most recent driver round with a hash-green row."""
    import json
    import re as _re
    from pathlib import Path

    latest: dict[str, int] = {}
    repo = Path(__file__).resolve().parents[2]
    for artifact in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"r(\d+)", artifact.name)
        if not m:
            continue
        try:
            data = json.loads(artifact.read_text())
        except (OSError, ValueError):
            continue
        rnd = int(m.group(1))
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("schema_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def next_round() -> int:
    """One past the newest driver correctness artifact."""
    import re as _re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    rounds = [
        int(m.group(1))
        for a in repo.glob("CORRECTNESS_r*.json")
        if (m := _re.search(r"r(\d+)", a.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def stale_green_queries() -> dict[str, int]:
    """Queries whose latest driver green predates the staleness bound
    (age = upcoming round − latest green round > MAX_GREEN_AGE_ROUNDS).
    These are seated in the upcoming driver window by the rotation;
    scripts/self_check.py asserts the seating."""
    nxt = next_round()
    latest = latest_green_round()
    return {
        n: nxt - latest[n]
        for n in QUERIES
        if n in latest and nxt - latest[n] > MAX_GREEN_AGE_ROUNDS
    }


def _rotate_least_verified_first() -> None:
    greens = _green_counts()
    greens_since = {rnd: _green_counts_since(rnd) for rnd in _CHANGED_IN}
    judge_only = _judge_only_verified()
    prior = _longest_waiting()
    latest = latest_green_round()
    nxt = next_round()

    def tier(n: str) -> int:
        if n in _PINNED_UNTIL_GREEN and greens.get(n, 0) == 0:
            return 0
        if greens.get(n, 0) == 0:
            return 1  # never driver-verified at all
        for rnd, names in _CHANGED_IN.items():
            if n in names and greens_since[rnd].get(n, 0) == 0:
                return 2  # green only for a superseded implementation
        if nxt - latest.get(n, nxt) > MAX_GREEN_AGE_ROUNDS:
            return 3  # evidence stale — re-seat before the steady state
        return 4

    ordered = sorted(
        QUERIES,
        key=lambda n: (
            tier(n),
            # Steady state is an LRU over driver evidence: oldest latest-
            # green first, so every query's staleness is bounded by
            # ~(registry / window) rounds with no manual bookkeeping —
            # the structural fix for the r4-green tail the staleness
            # tier catches after the fact.
            latest.get(n, 0),
            greens.get(n, 0),
            0 if n in prior else 1,
            1 if n in judge_only else 0,
        ),
    )
    rotated = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(rotated)


_rotate_least_verified_first()

__all__ = ["QUERIES", "queries_map", "oracle_sql_map"]
