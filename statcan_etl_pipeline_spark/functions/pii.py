"""PII detection / redaction patterns.

Patterns deliberately use only the regex subset on which Java's
engine (Spark executors) and RE2 (the DuckDB oracle) agree: no
lookaround, no backreferences, no possessive quantifiers. Redaction
itself is unit-tested on synthetic PII in tests/test_operators.py —
the shipped testdata is PII-free by construction, which the
`pii_scan_tables` report verifies (c_name digit runs are the one
expected non-zero class).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# kind -> (pattern, replacement) — dict order is report order
PII_RULES: dict[str, tuple[str, str]] = {
    "digit_run": (r"\d{6,}", "[NUM]"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\+?\d{3}[- ]?\d{3}[- ]?\d{4}", "[PHONE]"),
}

PII_PATTERNS: dict[str, str] = {k: v[0] for k, v in PII_RULES.items()}


def scrub(col: Column | str) -> Column:
    """Replace every PII match with its class tag. Rule order matters:
    email/ip/phone run before the digit_run catch-all so structured
    matches keep their specific tag."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in ("email", "ipv4", "phone", "digit_run"):
        pat, repl = PII_RULES[kind]
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match-count columns for a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }
