"""Rotation-policy helpers: the stalest-first assertion and the draw
preview in scripts/update_rotation.py (the round-14 finding: a window
draw passed over a 5-round-stale cohort without any mechanical check).
Pure-Python — no Spark session."""

import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "update_rotation", os.path.join(_REPO, "scripts", "update_rotation.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class TestStalenessViolations:
    def test_stalest_first_draw_passes(self):
        m = _mod()
        # window=2: draw holds the r9 row and one r10 row; the other
        # r10 row waits outside — boundary split, inside the 1-round slack
        allq = ["a", "b", "c", "d"]
        hist = {"a": [(9, True)], "b": [(10, True)],
                "c": [(10, True)], "d": [(12, True)]}
        assert m.staleness_violations(allq, hist, window=2) == []

    def test_r14_style_inversion_fails(self):
        m = _mod()
        # the r14 error class: the window holds 2-round-stale rows
        # while a much staler cohort sits outside
        allq = ["fresh1", "fresh2", "stale_out"]
        hist = {"fresh1": [(12, True)], "fresh2": [(12, True)],
                "stale_out": [(9, True)]}
        v = m.staleness_violations(allq, hist, window=2)
        assert len(v) == 1 and "stale_out" in v[0] and "r9" in v[0]

    def test_never_checked_rows_are_growth_not_violations(self):
        m = _mod()
        # growth rows (never checked) inside the window must not widen
        # the comparison; outside, they are rule-2 territory, not rule-6
        allq = ["growth", "a", "b"]
        hist = {"a": [(9, True)], "b": [(9, True)]}
        assert m.staleness_violations(allq, hist, window=2) == []

    def test_one_round_slack(self):
        m = _mod()
        allq = ["a", "b"]
        # outside exactly one round staler than the newest inside: OK
        hist = {"a": [(10, True)], "b": [(9, True)]}
        assert m.staleness_violations(allq, hist, window=1) == []
        # two rounds staler: violation
        hist = {"a": [(11, True)], "b": [(9, True)]}
        assert len(m.staleness_violations(allq, hist, window=1)) == 1


class TestDrawPreview:
    def test_growth_first_then_stalest_ledger_order(self):
        m = _mod()
        allq = ["old2", "new", "growth", "old1"]
        hist = {"old2": [(9, True)], "new": [(12, True)],
                "old1": [(9, True)]}
        # growth (never) first, then the r9 cohort in ledger order,
        # then the fresh row
        assert m.draw_preview(allq, hist, window=4) == [
            "growth", "old2", "old1", "new"
        ]

    def test_window_truncation(self):
        m = _mod()
        allq = [f"q{i}" for i in range(6)]
        hist = {q: [(9 + i, True)] for i, q in enumerate(allq)}
        assert m.draw_preview(allq, hist, window=3) == ["q0", "q1", "q2"]


class TestCurrentRegistryInvariant:
    def test_live_window_is_stalest_first(self):
        # the real registry + real CORRECTNESS history must satisfy
        # the invariant the script enforces
        m = _mod()
        sys.path.insert(0, _REPO)
        spec = importlib.util.spec_from_file_location(
            "entry", os.path.join(_REPO, "__spark_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)
        allq = list(entry.queries().keys())
        hist = m.load_history()
        assert m.staleness_violations(allq, hist) == []
