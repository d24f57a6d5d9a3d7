"""PII detection and redaction for LLM training-data pipelines.

The standard pre-training hygiene pass: find emails / phone numbers /
IPv4 addresses, count them per document, and rewrite the text with
typed placeholders.  Everything here is a pure Catalyst expression
(``regexp_extract_all`` / ``regexp_replace`` run JVM-side inside
whole-stage codegen — no Python in the loop), so at corpus scale the
scan cost is the regex pass itself, with no shuffle and no UDF.

Patterns are deliberately restricted to the Java-regex / RE2 common
subset (char classes, bounded quantifiers, ``\\b``) so the DuckDB
oracle reproduces matches byte-for-byte; a production deployment would
swap in larger pattern tables on the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_PATTERN, "<EMAIL>"),
    (PHONE_PATTERN, "<PHONE>"),
    (IPV4_PATTERN, "<IP>"),
]


def _col(text: str | Column) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_columns(text: str | Column) -> dict[str, Column]:
    """Per-row PII signals: match counts per category plus the first
    email (the usual "owner contact" heuristic).  One codegen'd regex
    scan per category."""
    c = _col(text)
    emails = F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0)
    return {
        "n_emails": F.size(emails).cast("long"),
        "n_phones": F.size(F.regexp_extract_all(c, F.lit(PHONE_PATTERN), 0)).cast("long"),
        "n_ipv4": F.size(F.regexp_extract_all(c, F.lit(IPV4_PATTERN), 0)).cast("long"),
        # F.get (not getItem): NULL on no-match instead of ANSI index error
        "first_email": F.get(emails, 0),
    }


def redact_pii_col(text: str | Column) -> Column:
    """Text with every PII match replaced by its typed placeholder.
    Email runs first: the other patterns cannot overlap its matches,
    so the chain order is otherwise immaterial."""
    c = _col(text)
    for pat, tag in _REDACTIONS:
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_sql_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB SQL fragments computing exactly the Spark columns above
    over ``text_expr`` (same names; redaction chain in the same
    order)."""
    redacted = text_expr
    for pat, tag in _REDACTIONS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{tag}', 'g')"
    return {
        "n_emails": f"CAST(len(regexp_extract_all({text_expr}, '{EMAIL_PATTERN}')) AS BIGINT)",
        "n_phones": f"CAST(len(regexp_extract_all({text_expr}, '{PHONE_PATTERN}')) AS BIGINT)",
        "n_ipv4": f"CAST(len(regexp_extract_all({text_expr}, '{IPV4_PATTERN}')) AS BIGINT)",
        "first_email": f"regexp_extract_all({text_expr}, '{EMAIL_PATTERN}')[1]",
        "redacted": redacted,
    }
