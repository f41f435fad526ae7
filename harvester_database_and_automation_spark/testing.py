"""Oracle-comparison harness mirroring the driver's correctness gate:
row-count + schema + order-insensitive value comparison between a Spark
query and its DuckDB oracle on the same parquet tables.

Used by tests/ and scripts/check_oracle.py so every registered query is
verified locally before the driver ever sees it.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from harvester_database_and_automation_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every corpus table registered as a view, matching the
    driver's pre-registered views."""
    con = duckdb.connect()
    for name in TABLES:
        src = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(src):
            # Multi-file tables (the derived sf1 corpus writes 8 files
            # per big table): DuckDB needs the glob, Spark reads the dir.
            src = f"{src}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return con


def _normalize_cell(v):
    if v is None or v is pd.NaT:  # NaT != NaT, so it must map to None
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # Collapse -0.0 vs 0.0 and represent at full precision.
        return v + 0.0
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, np.ndarray):  # array cells: before .item() (size!=1 raises)
        return tuple(_normalize_cell(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    return v


def canonical_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, normalize cells, sort rows — the driver's
    order-insensitive compare."""
    cols = sorted(df.columns)
    rows = [tuple(_normalize_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "PASS" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems:
            msg += f"\n    - {p}"
        return msg


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    problems: list[str] = []
    s_cols, s_rows = canonical_rows(spark_pdf)
    o_cols, o_rows = canonical_rows(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    if not problems:
        n_diff = 0
        first_diff = None
        max_float_diff = 0.0
        for sr, orow in zip(s_rows, o_rows):
            if sr != orow:
                n_diff += 1
                if first_diff is None:
                    first_diff = (sr, orow)
                for a, b in zip(sr, orow):
                    if isinstance(a, float) and isinstance(b, float):
                        max_float_diff = max(max_float_diff, abs(a - b))
        if n_diff:
            problems.append(f"{n_diff}/{len(s_rows)} rows differ; first: spark={first_diff[0]} oracle={first_diff[1]}")
            if max_float_diff:
                problems.append(f"max float diff among differing rows: {max_float_diff:.3e}")
    return CompareResult(
        name=name,
        ok=not problems,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        problems=problems,
    )


def check_query(spark, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str) -> CompareResult:
    from harvester_database_and_automation_spark.plans import QUERIES

    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # Rows-only gate: an empty result is a failure, not a pass.
        return CompareResult(name=name, ok=len(spark_pdf) > 0, spark_rows=len(spark_pdf), oracle_rows=-1,
                             problems=["no oracle: rows-only check"])
    oracle_pdf = con.execute(spec.oracle).df()
    return compare_frames(name, spark_pdf, oracle_pdf)
