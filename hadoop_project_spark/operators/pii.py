"""PII detection and redaction — the scrubbing stage of a training-data
pipeline (emails, phone numbers, IP addresses, SSNs, credit-card-like
digit runs → typed placeholder tokens).

Everything is built-in regexp machinery (``regexp_count`` /
``regexp_replace``) — JVM-side, whole-stage-codegen, no Python in the
hot path — so redaction runs at scan speed with zero shuffles and
scales linearly with input splits.

Patterns use RE2-safe syntax (no lookbehind): word-ish boundaries are
expressed with explicit boundary groups so the same patterns run under
Spark's Java regex and DuckDB's RE2 alike. Replacement order is fixed
(EMAIL → IPV4 → SSN → CCN → PHONE) and matters: e.g. an email's
digits must be consumed before phone matching, an IP before SSN-ish
digit groups. The synthetic `documents` corpus is lowercase word-salad
with no digits, so the driver-visible surface for this operator is the
fixture-backed unit suite (tests/test_pii.py) rather than a vacuous
always-zero corpus query (see driver-contract memory: data-dependent
no-op queries make the oracle comparison meaningless).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Order matters — applied (and counted) in this sequence.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"(^|[^0-9.])((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}"
             r"(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])($|[^0-9.])"),
    ("ssn", r"(^|[^0-9-])[0-9]{3}-[0-9]{2}-[0-9]{4}($|[^0-9-])"),
    ("ccn", r"(^|[^0-9])[0-9]{13,16}($|[^0-9])"),
    ("phone", r"(\+?[0-9]{1,3}[-. ])?(\([0-9]{3}\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}"),
)

# ipv4/ssn/ccn anchor on a non-member char (RE2 has no lookbehind), so
# the replacement must re-emit the captured boundary chars around the tag.
# Because the match CONSUMES that boundary char, two PII spans separated
# by a single char (e.g. "111-22-3333 444-55-6666") leave the second span
# boundary-less on the first scan — so these kinds count and replace in
# TWO passes: pass 1's replacement re-emits the boundary and inserts a
# "]" (itself boundary-eligible) next to any skipped neighbor, which
# pass 2 then matches. Two passes are sufficient for arbitrarily long
# adjacent chains: after pass 1 every unmatched span borders either its
# re-emitted separator or a placeholder tag.
_BOUNDARY_KINDS = {"ipv4": (1, 5), "ssn": (1, 2), "ccn": (1, 2)}


def _replacement(kind: str) -> str:
    tag = f"[{kind.upper()}]"
    if kind in _BOUNDARY_KINDS:
        pre, post = _BOUNDARY_KINDS[kind]
        return f"${pre}{tag}${post}"
    return tag


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-kind match counts (applied to the progressively-redacted text,
    mirroring the replacement sequence so kinds don't double-count)."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    for kind, pat in PII_PATTERNS:
        n = F.regexp_count(c, F.lit(pat))
        c = F.regexp_replace(c, pat, _replacement(kind))
        if kind in _BOUNDARY_KINDS:  # second pass for adjacent spans
            n = n + F.regexp_count(c, F.lit(pat))
            c = F.regexp_replace(c, pat, _replacement(kind))
        out[kind] = n.cast("long")
    return out


def redact(col: str | Column) -> Column:
    """Text with every PII span replaced by its typed placeholder."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, _replacement(kind))
        if kind in _BOUNDARY_KINDS:  # second pass for adjacent spans
            c = F.regexp_replace(c, pat, _replacement(kind))
    return c


def redact_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All input columns, with ``text_col`` redacted in place plus
    per-kind counts and a total `n_pii` column."""
    counts = pii_counts(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        *[c for c in docs.columns if c != text_col],
        redact(text_col).alias(text_col),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        total.alias("n_pii"),
    )
