"""Registration machinery for the named-query inventory.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (for
SQL-expressible operators) an equivalent ANSI-SQL oracle that DuckDB runs
over the same parquet tables. Column names/aliases MUST match between the
two — the correctness gate sorts columns by name and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check by the driver
    survey_ref: str  # operator ids from SURVEY.md §2 this exercises


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, survey_ref: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
