"""PII scrubbing: detect and redact emails, URLs, IPv4s and long digit
runs in document text — the compliance pass every training-data
pipeline runs before a corpus ships (C4/Dolma-style rule scrubbing).

Beyond-reference. Pure `regexp_count`/`regexp_replace` columns — JVM
regex inside codegen, no UDFs; at 100 TB this is a map-only stage that
fuses with whatever scan or filter surrounds it.

Patterns deliberately stay inside the Java-regex ∩ RE2 common subset
(character classes, bounded repeats, \\b; no lookarounds) so the DuckDB
twins match byte-for-byte — cross-engine agreement is asserted on
crafted rows in tests/test_operators.py. DuckDB's regexp_replace needs
the 'g' flag to match Spark's replace-all default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Detection patterns (order matters for redaction: URLs before emails
#: would eat "user@host" inside query strings — emails go first).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "longnum": r"\b\d{9,}\b",  # phone/account/SSN-ish digit runs
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """{kind: match-count column} for every PII pattern."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact(text: Column | str) -> Column:
    """Replace every PII match with a typed placeholder token."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{kind.upper()}>")
    return c


def flag_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs + per-kind match counts + `has_pii` flag + redacted text."""
    counts = pii_counts(text_col)
    out = docs
    for kind, col in counts.items():
        out = out.withColumn(f"n_{kind}", col)
    total = sum([F.col(f"n_{k}") for k in PII_PATTERNS], F.lit(0))
    return out.withColumn("has_pii", (total > 0).cast("int")).withColumn(
        "text_redacted", pii_redact(text_col)
    )


def pii_counts_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins: len(regexp_extract_all(...)) == Spark regexp_count."""
    return {
        kind: f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact_sql(text_expr: str) -> str:
    """DuckDB twin of `pii_redact` ('g' flag = Spark's replace-all)."""
    out = text_expr
    for kind, pat in PII_PATTERNS.items():
        out = f"regexp_replace({out}, '{pat}', '<{kind.upper()}>', 'g')"
    return out
