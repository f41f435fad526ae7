"""Oracle-drift guard (r8 verdict ask #3): prove the guard machinery
works — including that it FAILS when an oracle is artificially pinned —
and run it over a representative cross-section of the registry.

The full-registry sweep is `scripts/drift_guard.py` (artifact
DRIFT_GUARD.json, run each round); this test keeps the CI-time contract
on a fixed panel chosen so every input table is read by at least one
panel query.
"""

from __future__ import annotations

import tempfile

import pytest

from harvester_database_and_automation_spark.plans import QUERIES
from harvester_database_and_automation_spark.plans.shared import cleanup_scratch
from harvester_database_and_automation_spark.testing import (
    compare_frames,
    drift_check,
    duckdb_connection,
    perturb_corpus,
)

from conftest import SF_DIR

# Every input table is covered by at least one panel member (the panel
# stays small so the whole module runs in CI time at sf0.001). must_move
# marks queries whose read set provably includes a perturbed column —
# those must respond; the rest only need to move in lockstep (e.g.
# regional_revenue's filters may exclude the perturbed rows entirely).
PANEL = {
    # name: (tables covered, must_move)
    "pricing_summary": ("lineitem", True),
    "regional_revenue": ("region+nation+customer+orders+lineitem+supplier", False),
    "nations_per_region_string_agg": ("region+nation", True),
    "customer_rollup_region_nation": ("region+nation+customer", True),
    "customer_order_counts": ("customer+orders", False),
    "big_spender_semi_join": ("customer+orders", True),
    "parts_above_avg_price": ("part", False),
    "part_value_skyline": ("part", True),
    "part_match_rates_right_join": ("part+supplier", False),
    "supplier_plate_layout": ("supplier", True),
    "latest_event_type_per_user": ("events", False),
    "event_type_pivot": ("events", True),
    "first_event_per_user": ("events", True),
    "doc_fingerprint_exact_dedup": ("documents", True),
    "embedding_quantization_error": ("embeddings", True),
    "case_recode": ("orders", True),
    # k10 counts ACGT bases only — the appended '~X' perturbs length, not
    # base counts; lockstep still certified.
    "k10_base_frequency": ("documents", False),
}


@pytest.fixture(scope="module")
def pert(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("pert_corpus"))
    changed = perturb_corpus(SF_DIR, dst)
    return dst, changed


def test_perturbation_touches_every_table(pert):
    _, changed = pert
    assert set(changed) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    # Non-key columns changed in every table; keys untouched.
    for table, cols in changed.items():
        assert cols, f"{table}: no column perturbed"
        assert not any(c.endswith(("key", "_id")) for c in cols), (table, cols)


def test_panel_moves_in_lockstep(spark, pert):
    pert_dir, _ = pert
    clean_con = duckdb_connection(SF_DIR)
    pert_con = duckdb_connection(pert_dir)
    results = {}
    for name in PANEL:
        r = drift_check(spark, name, SF_DIR, pert_dir, clean_con, pert_con)
        results[name] = r
        cleanup_scratch()
        assert r.ok, (
            f"{name}: spark_moved={r.spark_moved} oracle_moved={r.oracle_moved} "
            f"perturbed_parity={r.perturbed_parity}"
        )
    # The perturbation must be VISIBLE: must_move queries read a perturbed
    # column, so they must respond. A panel that never moved would make
    # the lockstep assertion vacuous.
    for name, r in results.items():
        if PANEL[name][1]:
            assert r.spark_moved and r.oracle_moved, f"{name} did not move"


def test_all_rows_jitter_touches_every_table():
    """The stage-2 probe: every table's non-key columns change on EVERY
    row, with value-dependent deltas (a uniform shift would be invisible
    to shift-invariant queries)."""
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as dst:
        changed = perturb_corpus(SF_DIR, dst, all_rows=True)
        assert all(cols for cols in changed.values())
        # Value-dependence: perturbed orders dates move by DIFFERENT
        # amounts (uniform shifts preserve gap/threshold structure).
        a = pq.read_table(f"{SF_DIR}/orders.parquet").to_pydict()["o_orderdate"]
        b = pq.read_table(f"{dst}/orders.parquet").to_pydict()["o_orderdate"]
        deltas = {(y - x).total_seconds() for x, y in zip(a, b)}
        assert len(deltas) > 10, "timestamp jitter is uniform"


def test_no_move_ledger_names_registered_queries():
    """Every recorded no-move reason must name a live query — a renamed
    or deleted query must not leave a stale allowlist entry behind."""
    import importlib.util
    import sys as _sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "drift_guard_script",
        Path(__file__).resolve().parent.parent / "scripts" / "drift_guard.py",
    )
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["drift_guard_script"] = mod
    spec.loader.exec_module(mod)
    unknown = set(mod.NO_MOVE_REASONS) - set(QUERIES)
    assert not unknown, f"stale NO_MOVE_REASONS entries: {sorted(unknown)}"


def test_scale_dependent_no_move_reasons_pin_their_corpus():
    """Scale-tagged no-move entries ('the jitter flips no edge at this
    sf') are empirical claims, not plan invariants — they must only be
    honored at the corpus they were validated at; elsewhere the sweep
    must treat the query as unexplained (round-10 ADVICE)."""
    import importlib.util
    import sys as _sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "drift_guard_script2",
        Path(__file__).resolve().parent.parent / "scripts" / "drift_guard.py",
    )
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["drift_guard_script2"] = mod
    spec.loader.exec_module(mod)

    tagged = {n for n, e in mod.NO_MOVE_REASONS.items() if isinstance(e, dict)}
    assert "incremental_dup_components" in tagged  # corpus-scale claims stay tagged
    for name in tagged:
        valid_at = mod.NO_MOVE_REASONS[name]["valid_at_sf_dir"]
        reason, rejection = mod.resolve_no_move_reason(name, valid_at)
        assert reason and rejection is None
        reason2, rejection2 = mod.resolve_no_move_reason(name, "/root/testdata/sf0.1")
        assert reason2 is None and "does not transfer" in rejection2

    # Plan-provable (string) entries apply at any corpus.
    plain = next(n for n, e in mod.NO_MOVE_REASONS.items() if isinstance(e, str))
    reason, rejection = mod.resolve_no_move_reason(plain, "/anywhere/at/all")
    assert reason and rejection is None
    # Unknown queries resolve to (None, None) — 'no reason recorded'.
    assert mod.resolve_no_move_reason("not_a_query", "/x") == (None, None)


def test_guard_catches_pinned_oracle(spark, pert):
    """Negative control: pin one oracle to its clean-corpus result and the
    guard MUST flag it — this is the failure mode 400 green parity checks
    cannot see (both engines compared on the same corpus forever)."""
    pert_dir, _ = pert
    name = "case_recode"
    spec = QUERIES[name]
    clean_con = duckdb_connection(SF_DIR)
    pert_con = duckdb_connection(pert_dir)

    # Materialize the clean-corpus oracle result as a VALUES table: the
    # worst-case pin, indistinguishable from the real oracle on the clean
    # corpus (a plain parity check passes).
    pinned_df = clean_con.execute(spec.oracle).df()
    clean_con.register("pinned", pinned_df)
    pert_con.register("pinned", pinned_df)
    pinned_sql = "SELECT * FROM pinned"
    spark_clean = spec.fn(spark, SF_DIR).toPandas()
    assert compare_frames(name, spark_clean, pinned_df).ok, "pin must pass on clean corpus"

    class PinnedSpec:
        fn = staticmethod(spec.fn)
        oracle = pinned_sql

    import harvester_database_and_automation_spark.plans as plans_pkg

    real = plans_pkg.QUERIES[name]
    plans_pkg.QUERIES[name] = PinnedSpec()
    try:
        r = drift_check(spark, name, SF_DIR, pert_dir, clean_con, pert_con)
    finally:
        plans_pkg.QUERIES[name] = real
        cleanup_scratch()
    assert r.spark_moved and not r.oracle_moved
    assert not r.ok, "guard failed to flag a pinned oracle"
