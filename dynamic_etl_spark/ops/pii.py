"""PII detection and redaction over text columns.

Training-data pipelines scrub personally identifiable information before a
corpus ships; emails, phone numbers, and IP addresses are the canonical
regex-detectable tier. Everything here is a native regexp Column
expression — no UDFs, so a 100 TB corpus stays inside whole-stage codegen.

Every pattern is written in the Java-regex ∩ RE2 common subset (no
lookarounds, no backreferences) so the DuckDB oracle compiles the exact
same automaton and detection/redaction are oracle-checkable
(registry/curation.py). Beyond the reference surface (retail schema has
no document processing) — part of the LLM-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: (tier name, pattern, redaction tag) — ORDER IS CONTRACT: emails redact
#: first so a dotted mail domain can never surface as a phony IP match in
#: a downstream pass over already-redacted text.
TIERS = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
)


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-tier match counts (keys: email/phone/ip), all codegen."""
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in TIERS
    }


def has_pii(c: Column) -> Column:
    counts = pii_counts(c)
    total = counts["email"] + counts["phone"] + counts["ip"]
    return (total > 0).cast("int")


def redact(c: Column) -> Column:
    """Replace every PII match with its tier tag, in TIERS order."""
    out = c
    for _, pat, tag in TIERS:
        out = F.regexp_replace(out, pat, tag)
    return out
