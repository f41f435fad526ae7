"""Session-scoped shared subplans.

Several registered queries consume the same expensive intermediate — the
exploded mutation table feeds K1/K3/K4/lineage counts, the shingle table
feeds the whole Jaccard/MinHash dedup family. Re-deriving that subtree per
query is pure waste in any session that runs more than one of them (the
bench harness, a notebook, a scheduled report batch), so the first consumer
materializes it with ``persist(MEMORY_AND_DISK)`` and later consumers reuse
the cached partitions.

This mirrors the reference's design, where those intermediates are *tables*
(``consensus_sequence_mutation_nucleotide``, populated once and queried by
every downstream report — /root/reference/database/init.sql:403-410) rather
than per-query recomputations.

Scale note (100 TB): what is a ``persist`` here becomes a materialized
derived table via ``operators/publish.py`` on a real cluster — the cache is
the single-session analogue, not the deployment strategy. Only narrow
post-aggregation frames (mutation triples, shingle ids, signature sets) are
ever cached; raw text/genome payloads stay in the scan.
"""

from __future__ import annotations

from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_ATTR = "_hdas_shared_plans"


def shared_df(spark: SparkSession, key: tuple, builder: Callable[[], DataFrame]) -> DataFrame:
    """Return the session-cached DataFrame for ``key``, building + persisting
    it on first use. ``key`` must include every input the plan depends on
    (at minimum the sf_dir)."""
    cache: dict = spark.__dict__.setdefault(_ATTR, {})
    df = cache.get(key)
    if df is None:
        df = builder().persist(StorageLevel.MEMORY_AND_DISK)
        cache[key] = df
    return df


def clear_shared(spark: SparkSession) -> None:
    """Unpersist and drop every shared subplan (test isolation hook)."""
    cache: dict = spark.__dict__.pop(_ATTR, {})
    for df in cache.values():
        try:
            df.unpersist()
        except Exception:
            pass
