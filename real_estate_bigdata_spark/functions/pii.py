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

__all__ = [
    "PII_PATTERNS",
    "redact_pii",
    "pii_counts",
    "CREDIT_CARD_PATTERN",
    "luhn_valid",
    "luhn_check_digit",
    "credit_card_report",
]

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


#: candidate card-number runs: 13-19 digits with optional single
#: space/dash separators between them. Valid in Java regex AND RE2 (no
#: lookaround). Deliberately NOT in PII_PATTERNS: a bare regex
#: over-matches (order ids, timestamps) — card handling goes through
#: the Luhn check below instead of blind redaction.
CREDIT_CARD_PATTERN = r"\b(?:\d[ -]?){12,18}\d\b"


def luhn_valid(digits: Column) -> Column:
    """True iff ``digits`` (a digits-only string column) passes the
    Luhn mod-10 checksum — the check that separates a real card number
    from an arbitrary digit run (halves the false-positive rate of the
    regex alone; every issued PAN is Luhn-valid by ISO/IEC 7812).

    Pure Column expressions (transform + aggregate over the reversed
    character array — map-only, codegen-fused, no Python): from the
    RIGHTMOST digit, every second digit doubles (minus 9 when > 9) and
    the total must be divisible by 10. NULL in, NULL out; an empty
    string is not valid."""
    rev = F.split(F.reverse(digits), "")
    vals = F.transform(
        rev,
        lambda d, i: F.when(
            i % 2 == 1,
            d.cast("int") * 2 - F.when(d.cast("int") > 4, 9).otherwise(0),
        ).otherwise(d.cast("int")),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return (F.length(digits) > 0) & (total % 10 == 0)


def credit_card_report(text: Column) -> Column:
    """struct(n_card_candidates, n_cards_valid) for a text column:
    candidate runs matched by :data:`CREDIT_CARD_PATTERN`, separators
    stripped, length re-checked (13-19 digits), then Luhn-validated.
    The audit half of card hygiene — a doc with Luhn-VALID numbers is
    a drop/redact candidate; a doc with only invalid digit runs
    (timestamps, order ids) is not. Map-only Column expressions
    end-to-end. NULL text yields a NULL struct entry pair."""
    cands = F.regexp_extract_all(text, F.lit(CREDIT_CARD_PATTERN), 0)
    digits = F.transform(cands, lambda c: F.regexp_replace(c, "[ -]", ""))
    plausible = F.filter(
        digits, lambda d: (F.length(d) >= 13) & (F.length(d) <= 19)
    )
    valid = F.filter(plausible, luhn_valid)
    n = F.when(text.isNotNull(), F.size(plausible).cast("long"))
    v = F.when(text.isNotNull(), F.size(valid).cast("long"))
    return F.struct(
        n.alias("n_card_candidates"), v.alias("n_cards_valid")
    )


def luhn_check_digit(base: Column) -> Column:
    """The Luhn check digit for ``base`` (digits-only string): the
    digit c making ``base || c`` pass :func:`luhn_valid`. In the full
    number the appended digit occupies the rightmost (undoubled) slot,
    so ``base``'s own digits double from ITS rightmost — the parity
    complement of the validation pass. Used to synthesize valid card
    fixtures (drivers, tests) without hardcoding PANs."""
    rev = F.split(F.reverse(base), "")
    vals = F.transform(
        rev,
        lambda d, i: F.when(
            i % 2 == 0,
            d.cast("int") * 2 - F.when(d.cast("int") > 4, 9).otherwise(0),
        ).otherwise(d.cast("int")),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return ((F.lit(10) - total % 10) % 10).cast("string")
