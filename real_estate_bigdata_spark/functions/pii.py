"""PII scrubbing: regex redaction + per-document PII accounting.

Standard pre-training hygiene (C4/Dolma-style pipelines redact or drop
emails, phone numbers, IP addresses, and national-id patterns before
training). The reference repo has no analogue (scope:
`map_reduce/mapper.py`, `kafka_cc/` — crawl/count only); this is a
north-star training-pipeline operator.

Everything here is pure Column expressions — chained `regexp_replace`
/ `regexp_count` fused into the scan by codegen: map-only, no shuffle,
no Python. At 100 TB that is the whole story: PII scrubbing is
embarrassingly parallel and must never leave the JVM.

Pattern dialect: all patterns are valid in BOTH Java regex (Spark) and
RE2 (DuckDB oracle) — no lookaround, no backreferences — so the DuckDB
twin computes bit-identical redactions. Redaction order is fixed
(SSN before PHONE: both match digit runs, SSN's 3-2-4 grouping must
win; EMAIL before PHONE so digits inside a local-part are not torn).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts"]

#: kind -> (pattern, replacement token); insertion order IS the
#: redaction order (dicts preserve it).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # Phones REQUIRE group separators (555-123-4567, (555) 123.4567,
    # +84 555 123 4567) — a bare 10-digit run is not matched. RE2 has
    # no lookbehind, so an all-optional-separator pattern would tear
    # the last 10 digits out of any longer digit run (card numbers,
    # timestamps, parcel ids); the \b alternation below anchors the
    # area code at a real token boundary instead.
    "phone": (
        r"(?:\+\d{1,3}[-. ])?(?:\(\d{3}\)[-. ]?|\b\d{3}[-. ])\d{3}[-. ]?\d{4}\b",
        "[PHONE]",
    ),
    # Octet-validated (0-255); a syntactically valid quad in prose
    # (e.g. a version string "1.2.3.4") is indistinguishable from an
    # IP by regex alone and is redacted — inherent to the approach.
    "ipv4": (
        r"\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b",
        "[IP]",
    ),
}


def _kinds(kinds: list[str] | None) -> list[str]:
    if kinds is None:
        return list(PII_PATTERNS)
    bad = [k for k in kinds if k not in PII_PATTERNS]
    if bad:
        raise ValueError(f"unknown PII kinds {bad}; known: {list(PII_PATTERNS)}")
    # keep canonical order regardless of caller order — order is semantics
    return [k for k in PII_PATTERNS if k in kinds]


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """``text`` with every PII match replaced by its kind token
    (``[EMAIL]``, ``[SSN]``, ``[PHONE]``, ``[IP]``). NULL in, NULL out.
    ``kinds`` selects a subset; application order stays canonical."""
    out = text
    for k in _kinds(kinds):
        pat, tok = PII_PATTERNS[k]
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts(text: Column, kinds: list[str] | None = None) -> Column:
    """struct of per-kind match counts (``n_email`` …) for audit
    reports / drop-thresholds (e.g. drop docs with > K hits instead of
    redacting). Counts follow the same canonical order, counting each
    kind on the text AFTER earlier kinds were redacted — so a phone
    inside an email's local-part is billed to email only and the kinds
    sum to the total number of redactions `redact_pii` performs."""
    fields = []
    cur = text
    for k in _kinds(kinds):
        pat, tok = PII_PATTERNS[k]
        fields.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{k}"))
        cur = F.regexp_replace(cur, pat, tok)
    return F.struct(*fields)
