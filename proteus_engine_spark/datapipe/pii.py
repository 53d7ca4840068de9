"""PII detection and redaction for training-data pipelines.

Every LLM-corpus pipeline scrubs personally-identifying strings before
training (emails, phone numbers, IP addresses are the standard rule-based
tier; named-entity scrubbing sits on top as a model pass). Built entirely
from Catalyst regexp expressions: at 100 TB this fuses into the parquet
scan inside whole-stage codegen — no Python, no shuffle, embarrassingly
parallel per row.

The patterns stay inside the regex subset Java's engine and RE2 (DuckDB)
interpret identically, so the oracle can mirror them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Category -> (pattern, replacement tag). Order matters for scrubbing:
# emails first (an email contains dot-runs an aggressive IP pattern could
# otherwise nibble), then phones, then IPs.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "[EMAIL]"),
    # Three RE2/Java-identical alternatives: +CC international groups,
    # (NNN) NNN-NNNN, and dash/space-grouped domestic numbers ending in a
    # ddd[- ]dddd tail (which is what keeps ISO dates 2024-01-15 from
    # matching). Separators are dash/space only — dots would collide with
    # the IPv4 pattern below. Leading \b is omitted where the first char
    # is non-word (+ or parenthesis), where \b can never match.
    "phone": (
        r"\+\d{1,3}[ -]?\(?\d{2,4}\)?(?:[ -]\d{2,4}){1,3}\b"
        r"|\(\d{3}\)[ -]?\d{3}[ -]\d{4}\b"
        r"|\b\d{2,4}[ -](?:\d{2,4}[ -])?\d{3}[ -]\d{4}\b",
        "[PHONE]",
    ),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
}


def pii_counts(text: str | Column) -> list[Column]:
    """Per-category match counts (`n_email`, `n_phone`, `n_ipv4`)."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{name}")
        for name, (pat, _tag) in PII_PATTERNS.items()
    ]


def pii_scrub(text: str | Column) -> Column:
    """The redacted text: every match replaced by its category tag, in
    PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, (pat, tag) in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, tag)
    return c


def scrub_documents(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Attach per-category counts and the redacted text to each row."""
    return df.select(
        "*",
        *pii_counts(text_col),
        pii_scrub(text_col).alias(out_col),
    )
