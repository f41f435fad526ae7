"""M6 — state-gated idempotent runs.

The reference keeps a tiny key-value table ``automation_state``
(database/init.sql:952-956) that importers consult to skip work when the
input has not changed (import_bag_meldeformular.R:106-113,
database/python/viollier/database_connector.py:79-103).

Spark-first: the state is driver-side metadata (a few bytes), so a JSON
file beside the output tables is the honest equivalent — no cluster round
trip for a single value. ``run_if_changed`` wraps the read-compare-skip
contract.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable


class JobState:
    """A tiny persistent key-value store with atomic writes."""

    def __init__(self, path: str) -> None:
        self._path = path

    def _load(self) -> dict[str, str]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path, encoding="utf-8") as fh:
            return json.load(fh)

    def get(self, key: str, default: str | None = None) -> str | None:
        return self._load().get(key, default)

    def set(self, key: str, value: str) -> None:
        state = self._load()
        state[key] = value
        d = os.path.dirname(self._path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".state-")
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(state, fh, sort_keys=True)
        os.replace(tmp, self._path)

    def run_if_changed(self, key: str, fingerprint: str, job: Callable[[], None]) -> bool:
        """Run ``job`` only if ``fingerprint`` differs from the stored value
        for ``key``; record it AFTER success so failed runs retry. Returns
        True when the job ran."""
        if self.get(key) == fingerprint:
            return False
        job()
        self.set(key, fingerprint)
        return True
