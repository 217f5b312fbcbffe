"""PII redaction for training-data pipelines: emails, URLs, phone-like digit
runs, and IPv4 addresses replaced with typed placeholder tags.

All native ``regexp_replace`` chains (JVM-side, codegen-able) — no Python in
the hot path. The synthetic ``documents`` fixtures contain no PII-like
patterns (verified: zero digits/@/http across all SFs), so this ships as a
tested column function rather than a catalog query whose oracle would be a
vacuous identity transform; tests/test_redact.py pins behavior on a real
fixture.

Patterns deliberately stay inside the regex subset where Java's engine and
RE2 agree (no backreferences, no lookaround), so the same patterns run
unchanged on engines like DuckDB/Trino if a differential check is wanted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: URLs before emails would still be safe, but emails first
# keeps `mailto:`-less addresses inside URLs from being double-tagged;
# IPv4 runs BEFORE phones so dotted quads are tagged <IP> rather than
# eaten by the digit-run rule.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# 7-15 digits total (ITU E.164 ceiling), at most 2 separator chars between
# consecutive digits — so year ranges ("2020 - 2021") and space-separated
# quantity runs of short numbers don't get swallowed as <PHONE>.
PHONE_RE = r"\+?\d(?:[().\- ]{0,2}\d){6,14}"

_CHAIN = [
    (EMAIL_RE, "<EMAIL>"),
    (URL_RE, "<URL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every email / URL / IPv4 / phone-like span with its tag."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, tag in _CHAIN:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(col: Column | str) -> Column:
    """Struct of per-category match counts (email, url, ip, phone) — the
    audit metric a scrub job emits alongside the rewritten text. Counted on
    the progressively-redacted text exactly like :func:`redact_pii` rewrites
    it, so overlapping categories are attributed to the first matching rule
    and the counts sum to the number of placeholder tags in the output."""
    cur = F.col(col) if isinstance(col, str) else col
    fields = []
    names = ["email", "url", "ip", "phone"]
    for (pattern, tag), name in zip(_CHAIN, names):
        fields.append(F.regexp_count(cur, F.lit(pattern)).alias(name))
        cur = F.regexp_replace(cur, pattern, tag)
    return F.struct(*fields)
