"""Write-path operators (SURVEY.md §2.10 M1-M6)."""

from harvester_database_and_automation_spark.operators.dedup import keep_best
from harvester_database_and_automation_spark.operators.joins import coalesce_join
from harvester_database_and_automation_spark.operators.layout import cluster_for_write
from harvester_database_and_automation_spark.operators.merge import (
    apply_deletes,
    classify_changes,
    merge_upsert,
)
from harvester_database_and_automation_spark.operators.skew import (
    salted_aggregate,
    salted_count_distinct,
    salted_join,
)
from harvester_database_and_automation_spark.operators.publish import (
    current_version,
    publish_versioned,
    read_published,
)
from harvester_database_and_automation_spark.operators.state import JobState

__all__ = [
    "merge_upsert",
    "classify_changes",
    "apply_deletes",
    "publish_versioned",
    "read_published",
    "current_version",
    "JobState",
    "keep_best",
    "coalesce_join",
    "cluster_for_write",
    "salted_join",
    "salted_aggregate",
    "salted_count_distinct",
]
