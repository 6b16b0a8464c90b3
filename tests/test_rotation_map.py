"""Unit tests for rotation_map.compute_slot_map — the derived slot-map
tool (r14, VERDICT r13 task #6) that replaces the hand-written
COVERAGE.md rotation bookkeeping. Pure function over synthetic
histories: no Spark, no repo artifacts."""

from __future__ import annotations

import rotation_map as rm


def _names(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


class TestComputeSlotMap:
    def test_mandatory_block_is_three_rounds_old_oracles(self):
        """Rule 1: the block = oracle queries whose LATEST row is N-3,
        in that CORRECTNESS file's key order; queries re-verified since
        are excluded."""
        registry = _names("q", 6)
        oracles = set(registry)
        hist = {
            1: ["q0", "q1", "q2"],
            2: ["q3"],
            3: ["q2", "q4"],  # q2 re-verified in r2... r3
        }
        m = rm.compute_slot_map(registry, oracles, hist, rnd=4)
        assert m["mandatory"] == ["q0", "q1"]
        assert m["violations"] == []

    def test_rows_only_queries_never_enter_the_block(self):
        registry = ["q0", "q1", "r0"]
        oracles = {"q0", "q1"}  # r0 is rows-only
        hist = {1: ["q0", "r0"], 2: [], 3: ["q1"]}
        m = rm.compute_slot_map(registry, oracles, hist, rnd=4)
        assert m["mandatory"] == ["q0"]
        assert "r0" not in m["in_cap"]

    def test_pending_first_rows_seat_in_registry_order(self):
        """Rule 4: oracle queries with no driver row yet take the spare
        slots, in registry order."""
        registry = _names("q", 3) + ["new_b", "new_a"]
        oracles = set(registry)
        hist = {1: ["q0", "q1", "q2"], 2: [], 3: []}
        m = rm.compute_slot_map(registry, oracles, hist, rnd=4)
        assert m["pending"] == ["new_b", "new_a"]  # registry order, not sorted
        assert m["in_cap"] == ["q0", "q1", "q2", "new_b", "new_a"]
        assert m["free_slots"] == rm.CAP - 5

    def test_staleness_breach_is_a_violation(self):
        """An oracle query whose latest row predates N-3 is a rule-1
        breach — reported, never silently absorbed."""
        registry = ["q0", "q1"]
        hist = {1: ["q0"], 2: [], 3: [], 4: ["q1"]}
        m = rm.compute_slot_map(registry, set(registry), hist, rnd=7)
        assert any("rule-1" in v and "q0" in v for v in m["violations"])

    def test_capacity_overflow_and_rule4_deferral_reported(self):
        big = _names("q", rm.CAP + 2)
        pending = ["p0", "p1"]
        registry = big + pending
        hist = {1: big, 2: [], 3: []}
        m = rm.compute_slot_map(registry, set(registry), hist, rnd=4)
        assert any("rule-2" in v for v in m["violations"])
        # deferral is a WARNING (legitimate under the two-round bound;
        # deferred queries seat first at the next round's spares), not
        # a hard violation
        assert m["deferred"] == pending
        assert any("rule-4" in w and "p0" in w for w in m["warnings"])
        assert len(m["in_cap"]) == len(m["mandatory"])  # nothing seated

    def test_deregistered_queries_are_ignored(self):
        """A consolidated (retired) query appears in history but not in
        the registry — it must not claim a slot or raise staleness."""
        registry = ["q0"]
        hist = {1: ["q0", "retired"], 2: [], 3: []}
        m = rm.compute_slot_map(registry, {"q0"}, hist, rnd=4)
        assert m["mandatory"] == ["q0"]
        assert m["violations"] == []

    def test_default_round_is_max_history_plus_one(self):
        hist = {11: ["q0"], 12: [], 13: []}
        m = rm.compute_slot_map(["q0"], {"q0"}, hist)
        assert m["round"] == 14
        assert m["mandatory"] == ["q0"]
