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

# The driver's correctness artifact records the first N registered queries
# (round 1 captured exactly 50, in registration order). Rotate so queries
# WITHOUT a green CORRECTNESS_r01.json row run first; the 50 already-green
# relational/text queries follow. Across rounds this gives every query a
# driver-verified entry.
_R01_CHECKED = frozenset(
    {
        "pricing_summary", "filter_project", "case_recode", "regional_revenue",
        "customer_order_counts", "weekly_activity_full_outer", "big_spender_semi_join",
        "no_urgent_order_anti_join", "monthly_priority_spine", "intensity_spine_rollup",
        "expression_join_name_parse", "values_lookup_join", "cheapest_order_per_customer",
        "salted_supplier_totals", "salted_brand_volume", "global_sequence_ids",
        "order_priority_pick", "top_parts_by_revenue", "union_all_conform",
        "union_distinct_nations", "rich_nations_except", "conditional_agg_linestatus",
        "distinct_customers_per_priority", "nations_per_region_string_agg",
        "hot_parts_having", "customer_rollup_region_nation",
        "nation_share_of_region_revenue", "parts_above_avg_price",
        "order_value_percentiles", "first_event_per_user", "orders_per_isoweek",
        "weekly_sequencing_report", "order_age_buckets", "json_props_extract",
        "part_name_regex", "event_sessionization", "event_type_pivot",
        "part_name_word_counts", "stratified_sample_per_nation", "work_queue_next_slice",
        "priority_boolean_topk", "latest_event_type_per_user",
        "nations_by_key_desc_string_agg", "fk_orphan_audit", "supplier_plate_layout",
        "order_status_grouping_sets", "doc_token_stats", "doc_quality_score",
        "doc_lang_guess", "doc_top_words",
    }
)


def _rotate_unchecked_first() -> None:
    ordered = sorted(QUERIES, key=lambda n: n in _R01_CHECKED)
    rotated = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(rotated)


_rotate_unchecked_first()

__all__ = ["QUERIES", "queries_map", "oracle_sql_map"]
