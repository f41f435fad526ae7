"""Custom stateful streaming operator via applyInPandasWithState.

The reference's work-queue incremental compute ("process rows whose result
is null, remember progress", import_nextclade.R:197-209,
OriginCountryEstimator.java:189-209) becomes per-key streaming state:
each key carries a running aggregate that survives across micro-batches
through the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, total_seen bigint, new_in_batch bigint"
STATE_SCHEMA = "total bigint"


def _update(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch = sum(len(pdf) for pdf in pdfs)
    total = (state.get[0] if state.exists else 0) + batch
    state.update((total,))
    yield pd.DataFrame(
        {"key": [key[0]], "total_seen": [total], "new_in_batch": [batch]}
    )


def running_dedup_counts(keyed: DataFrame, key_col: str = "key") -> DataFrame:
    """Per-key running row counts across micro-batches.

    Input: a streaming DataFrame with ``key_col``. Output: one row per key
    per batch with the all-time total and this batch's increment —
    the skeleton for exactly-once incremental work ledgers (state lives
    in the checkpoint, not in an external table).
    """
    return keyed.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
