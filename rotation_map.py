"""Compute the current round's driver in-cap slot map from CORRECTNESS
history + the registry-growth policy — the single source COVERAGE.md's
rotation section and tests/test_queries.py's structural pin both cite
(VERDICT r13 task #6: the hand-written ~200-line slot-map prose and the
per-round test re-derived the same facts independently; this tool is
now the one derivation).

Policy (COVERAGE.md "Registry-growth policy", binding from r13):

1. **Staleness contract** — every oracle-bearing query's most recent
   driver verification is at most TWO rounds stale, so round N's
   MANDATORY block is exactly the oracle-bearing registry queries whose
   latest driver row is round N-3 (verified then, not since).
   Rows-only queries are outside the rotation (no hash signal).
2. **Capacity arithmetic** — 50 slots x 3 rounds >= oracle count;
   violations are reported, not silently absorbed.
3. **Family invariant** — maintained by construction (every past-cap
   query's operator family keeps an in-cap sibling; checked by the
   COVERAGE.md table, not recomputed here).
4. **First-row latency bound** — a newly registered oracle query gets
   its first driver row within two rounds; PENDING queries (oracle-
   bearing, never in any CORRECTNESS file) seat at the round's spare
   slots in registry order.

In-cap order: the mandatory block in CORRECTNESS_r{N-3} key order, then
pending first-row oracles in registry order. The driver records exactly
the FIRST 50 ``queries()`` entries, so ``queries()`` must lead with this
list verbatim — ``python rotation_map.py [round]`` prints the map and
exits non-zero if the live registry's first-50 window diverges.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CAP = 50


def correctness_history(here: str = HERE) -> dict[int, list[str]]:
    """Round -> ordered driver-recorded query names, from CORRECTNESS_r*.json."""
    hist: dict[int, list[str]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            hist[int(m.group(1))] = list(json.load(fh))
    return hist


def compute_slot_map(
    registry_names: list[str],
    oracle_names: set[str],
    hist: dict[int, list[str]],
    rnd: int | None = None,
) -> dict:
    """Derive round ``rnd``'s in-cap window (defaults to max history round + 1).

    Returns {round, mandatory, pending, seated, deferred, in_cap,
    free_slots, violations, warnings}: ``mandatory`` = oracle-bearing
    queries whose latest driver row is rnd-3 (rule 1), in that file's
    key order; ``pending`` = oracle-bearing queries with NO driver row
    yet, registry order; ``seated`` = the pending prefix that fits the
    spare slots; ``deferred`` = pending queries waiting for the next
    round's spares (legitimate under rule 4's two-round bound — they
    seat FIRST next round because pending precedes everything but the
    mandatory block); ``in_cap`` = mandatory + seated (the required
    queries() prefix); ``violations`` = hard rule breaches (stale
    oracle rows older than rnd-3, capacity overflow); ``warnings`` =
    the deferral notice.
    """
    if rnd is None:
        rnd = max(hist) + 1
    # Round N's map is derived from what the driver had verified BEFORE
    # round N ran: rounds >= N are that round's own (or future) driver
    # artifacts and must not count as history, or the map silently
    # changes the moment the driver file lands (VERDICT r14 what's-wrong
    # #1 — the r14 pin broke when CORRECTNESS_r14.json appeared because
    # the 48 r11-returners' "latest" row became r14).
    hist = {r: names for r, names in hist.items() if r < rnd}
    registered = set(registry_names)
    oracles = oracle_names & registered
    latest: dict[str, int] = {}
    for r, names in hist.items():
        for q in names:
            if q in registered:
                latest[q] = max(latest.get(q, r), r)

    base_round = rnd - 3
    mandatory = [
        q for q in hist.get(base_round, [])
        if q in oracles and latest.get(q) == base_round
    ]
    pending = [q for q in registry_names if q in oracles and q not in latest]

    violations: list[str] = []
    # Rule-2 capacity arithmetic, checked at registration time (VERDICT
    # r14 task #4): 50 slots x 3 rounds bounds how many oracle queries
    # the staleness contract can sustain. Breaching it here fails the
    # structural pin BEFORE a stale row can appear two rounds later.
    if len(oracles) > CAP * 3:
        violations.append(
            f"rule-2 capacity breach: {len(oracles)} oracle queries > "
            f"{CAP} slots x 3 rounds = {CAP * 3} — consolidate before "
            f"registering more"
        )
    overdue = sorted(
        q for q in oracles if q in latest and latest[q] < base_round
    )
    if overdue:
        violations.append(
            f"rule-1 staleness breach (latest row older than r{base_round}): {overdue}"
        )
    spare = CAP - len(mandatory)
    if spare < 0:
        violations.append(
            f"rule-2 capacity overflow: mandatory block is {len(mandatory)} > {CAP}"
        )
        spare = 0
    seated, deferred = pending[:spare], pending[spare:]
    warnings = []
    if deferred:
        warnings.append(
            "rule-4 deferral (must seat at an r%d spare): %s"
            % (rnd + 1, deferred)
        )
    in_cap = mandatory + seated
    return {
        "round": rnd,
        "mandatory": mandatory,
        "pending": pending,
        "seated": seated,
        "deferred": deferred,
        "in_cap": in_cap,
        "free_slots": CAP - len(in_cap),
        "violations": violations,
        "warnings": warnings,
    }


def current_slot_map(rnd: int | None = None) -> dict:
    """The live repo's slot map: registry + oracles from __spark_entry__."""
    sys.path.insert(0, HERE)
    import __spark_entry__ as entry

    return compute_slot_map(
        list(entry.queries()), set(entry.oracle_sql()), correctness_history(), rnd
    )


def main(argv: list[str]) -> int:
    rnd = int(argv[1]) if len(argv) > 1 else None
    m = current_slot_map(rnd)
    print(json.dumps(m, indent=1))
    sys.path.insert(0, HERE)
    import __spark_entry__ as entry

    window = list(entry.queries())[:CAP]
    ok = True
    if window[: len(m["in_cap"])] != m["in_cap"]:
        print(
            f"REGISTRY MISMATCH: queries() first-{len(m['in_cap'])} window "
            f"diverges from the computed map",
            file=sys.stderr,
        )
        ok = False
    for w in m["warnings"]:
        print(f"WARNING: {w}", file=sys.stderr)
    for v in m["violations"]:
        print(f"VIOLATION: {v}", file=sys.stderr)
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
