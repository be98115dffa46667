"""Regex redaction / PII scrubbing (driver extension).

Chained JVM-side ``regexp_replace`` + ``regexp_count`` — no UDFs, fuses
into the scan stage, zero shuffle, linear at any scale. Patterns stay in
the RE2-compatible subset (no lookarounds) so the same expressions run
under Java regex (Spark), RE2 (DuckDB), and most other engines — the
audit query elsewhere reproduces the redaction exactly.

No counterpart in /root/reference (native engine has no text-pipeline
ops); driver-mandated LLM-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe: character classes + bounded repeats only.
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def redact(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
    out_col: str = "redacted",
    count_prefix: str = "n_",
) -> DataFrame:
    """Replace every match of each labeled pattern with ``[LABEL]`` and
    report per-label match counts (counted on the ORIGINAL text, so
    counts are independent of application order; replacements apply in
    sorted label order). Adds ``out_col`` and one ``n_<label>`` column
    per pattern."""
    pats = patterns if patterns is not None else DEFAULT_PATTERNS
    red = F.col(text_col)
    counts = []
    for label in sorted(pats):
        pat = pats[label]
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(
                f"{count_prefix}{label}"
            )
        )
        red = F.regexp_replace(red, pat, f"[{label.upper()}]")
    return df.select("*", red.alias(out_col), *counts)
