"""PII detection / redaction / anonymization (X32).

A corpus headed for model training needs PII handling; an nginx log
warehouse needs GDPR IP anonymization (the reference stores raw
``remote_addr`` forever — reference ingestor/main.py:83-101 — which is
exactly what an EU deployment cannot do). Both are narrow maps over one
text column: pure ``regexp_count``/``regexp_replace`` expressions,
whole-stage codegen, no shuffle, no Python.

Pattern dialect: every regex below is valid AND equivalent in Java
(Spark) and RE2 (DuckDB) — character classes, bounded repetition,
non-capturing groups, and ``\\b`` word boundaries only; no lookarounds
(RE2 has none), no possessive quantifiers. That keeps each operator
SQL-oracle-expressible.

Redaction order matters and is fixed: emails first (an email contains
dots and digits but an IP/phone never contains ``@``), then IPv4, then
phones — so one class's replacement token never partially matches a
later pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-class PII occurrence counts for one text column."""
    t = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)),
        "n_ipv4": F.regexp_count(t, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(t, F.lit(PHONE_RE)),
    }


def redact_text(text: Column | str) -> Column:
    """All three PII classes replaced by typed tokens (fixed order, see
    module docstring)."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    t = F.regexp_replace(t, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(t, PHONE_RE, PHONE_TOKEN)


def anonymize_ipv4(ip: Column | str) -> Column:
    """GDPR-style IPv4 anonymization: zero the host octet
    (``203.0.113.77`` -> ``203.0.113.0``). Coarse enough to break user
    identification, fine enough to keep /24 geo aggregation working."""
    t = F.col(ip) if isinstance(ip, str) else ip
    return F.regexp_replace(t, r"\.[0-9]{1,3}$", ".0")


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str = "clean_text",
) -> DataFrame:
    """Append per-class counts and the redacted text. Counting runs on
    the ORIGINAL text (counts are audit evidence; redaction must not
    change them)."""
    counts = pii_counts(text_col)
    return df.withColumns(
        {**counts, out_col: redact_text(text_col)}
    )
