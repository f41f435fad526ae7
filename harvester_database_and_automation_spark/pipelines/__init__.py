"""End-to-end batch pipelines composed from sources/operators/functions
(SURVEY.md §3)."""

from harvester_database_and_automation_spark.pipelines.feed_import import (
    FeedImportReport,
    run_feed_import,
)
from harvester_database_and_automation_spark.pipelines.release import build_release_plan

__all__ = ["run_feed_import", "FeedImportReport", "build_release_plan"]
