"""PII detection and redaction — the standard pre-training privacy pass
(emails, SSNs, phone numbers, IPv4 addresses) as pure codegen regex columns.

Reference parity note: no PII surface exists in the reference proxy; this
extends the LLM-data-pipeline tier, value-checked against DuckDB twins
(kgtm.oracles.q_pii_signals / q_redact_pii).

Pattern portability contract: every regex below is simultaneously valid
Java-regex (Spark) and RE2 (DuckDB) with IDENTICAL semantics — no
lookaround, no backreferences, only character classes, bounded repetition
and ASCII word boundaries. Counts are computed independently per kind on
the ORIGINAL text; redaction applies the kinds sequentially in PII_KINDS
order on both engines, so overlapping matches resolve identically.

Scale shape (100 TB): zero shuffle, zero UDF — a single narrow projection
that fuses into whatever scan precedes it (whole-stage codegen), exactly
what a trillion-token redaction sweep needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "PII_KINDS", "pii_signals", "redact_col", "redact_pii"]

# kind -> (pattern, replacement token); ORDER IS THE REDACTION ORDER.
# SSN precedes phone so 3-2-4 digit groups are never half-eaten by the
# 3-3-4 phone shape; phone precedes ipv4 so dotted 3-3-4 runs redact as
# phones (both engines agree because the order is shared).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "phone": (r"\+?\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b", "<IP>"),
}
PII_KINDS: tuple[str, ...] = tuple(PII_PATTERNS)


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")


def pii_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts: ``n_{kind}`` per kind, ``n_pii`` total,
    ``has_pii`` flag. Counts are per-kind independent (a dotted phone-shaped
    string inside a longer digit run can legitimately count under two
    kinds); redact_pii is where precedence is resolved."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {k: _count(t, p) for k, (p, _) in PII_PATTERNS.items()}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[counts[k].alias(f"n_{k}") for k in PII_KINDS],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def redact_col(text: Column) -> Column:
    """The redaction as a single column expression (kinds applied
    sequentially in PII_KINDS order) — use this to redact in place inside a
    wider projection without a join."""
    t = F.coalesce(text, F.lit(""))
    for _, (pattern, token) in PII_PATTERNS.items():
        t = F.regexp_replace(t, pattern, token)
    return t


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Adds ``out_col``: the text with every PII match replaced by its
    typed token."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col),
        redact_col(F.col(text_col)).alias(out_col),
    )
