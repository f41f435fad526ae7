"""S7 — chunked file export + driver-side upload (SURVEY.md §2.1).

The reference exports CSV in bounded chunks and ships them over WebDAV
(automation/pangolin_lineage_exporter/pangolin_lineage_exporter.py:66-110,
MAX_LINES_PER_FILE=100 at :26; owncloud sync at
automation/polybox_updater/entrypoint.sh:1-22), then records what was
submitted (database/R/record_spsp_submission.R).

Spark-first: the chunk contract is ``maxRecordsPerFile`` on a normal
distributed write — no driver-side row slicing — and the upload is a
driver-side loop over the finished part files through an injectable
transport (the same seam as sources/http.py), returning a manifest with
content hashes so the "record what we shipped" step is a table append.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

# (dest_url, file_name, payload) -> None; real deployments plug WebDAV/SFTP.
UploadTransport = Callable[[str, str, bytes], None]


def export_chunked_csv(
    df: DataFrame,
    out_dir: str,
    max_lines_per_file: int = 100,
    header: bool = True,
    sep: str = ",",
) -> list[str]:
    """Write ``df`` as CSV part files of at most ``max_lines_per_file``
    data rows each (the export contract) and return their paths sorted."""
    (
        df.write.mode("errorifexists")
        .option("maxRecordsPerFile", max_lines_per_file)
        .option("header", header)
        .option("sep", sep)
        .csv(out_dir)
    )
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".csv") and not f.startswith(("_", "."))
    )


@dataclass(frozen=True)
class UploadRecord:
    file_name: str
    n_bytes: int
    sha256: str


def upload_files(
    paths: list[str], dest_url: str, transport: UploadTransport
) -> list[UploadRecord]:
    """Ship each file through ``transport`` and return the submission
    manifest (name, size, content hash) — the record_spsp_submission
    contract: what was sent is durably identifiable afterwards."""
    manifest: list[UploadRecord] = []
    for path in paths:
        with open(path, "rb") as fh:
            payload = fh.read()
        name = os.path.basename(path)
        transport(dest_url, name, payload)
        manifest.append(
            UploadRecord(name, len(payload), hashlib.sha256(payload).hexdigest())
        )
    return manifest
