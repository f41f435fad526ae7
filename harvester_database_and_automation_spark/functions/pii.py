"""PII detection and redaction over free-text columns.

The reference's data-retention pass nulls entire columns after a retention
window (`database/sql/2022-03-31 Delete some BAG data.sql:1-80`); a
training-data pipeline needs the finer-grained version: find personally
identifying substrings inside free text and redact them in place, keeping
the rest of the document. Everything here is JVM-side `regexp_*` — a pure
map over the corpus with no shuffle, so it scales linearly with input
splits at 100 TB.

The regex subset is deliberately portable (no lookahead/backrefs) so the
same patterns run under Java's regex engine (Spark) and RE2 (DuckDB
oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Portable across Java regex and RE2: character classes, bounded repeats,
# and \b only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"

# Redaction must run email -> ip -> phone: an email can contain dotted
# digits and an IPv4 contains phone-shaped digit runs, so the broader
# patterns are consumed first.
_ORDERED = [(EMAIL_RE, "[EMAIL]"), (IPV4_RE, "[IP]"), (PHONE_RE, "[PHONE]")]


def scrub_pii(col: Column) -> Column:
    """Replace every email / IPv4 / phone-shaped substring with a typed
    redaction token. Pure `regexp_replace` chain — whole-stage-codegen
    friendly, no UDF."""
    out = col
    for pattern, token in _ORDERED:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-row match counts for each PII class (pre-redaction)."""
    return {
        "emails": F.regexp_count(col, F.lit(EMAIL_RE)),
        "ips": F.regexp_count(col, F.lit(IPV4_RE)),
        "phones": F.regexp_count(col, F.lit(PHONE_RE)),
    }
