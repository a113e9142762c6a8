"""Registry-rotation invariants (__spark_entry__._rotated).

The external checker samples the FIRST 50 registry entries per round,
so the rotation ordering is load-bearing: a regression here silently
starves half the registry of correctness rows.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_rotated_orders_by_count_then_latest_then_insertion(monkeypatch):
    registry = {f"q{i}": i for i in range(6)}
    counts = {"q0": 2, "q1": 1, "q2": 1, "q3": 0, "q5": 2}
    latest = {"q1", "q5"}  # q1 checked most recently, q2 longer ago
    monkeypatch.setattr(entry, "_check_counts", lambda: (counts, latest))
    order = list(entry._rotated(registry))
    # never-checked first (insertion order), then count-1 preferring the
    # one absent from the latest round, then count-2 likewise
    assert order == ["q3", "q4", "q2", "q1", "q0", "q5"]
    # values ride along untouched
    assert entry._rotated(registry)["q3"] == 3


def test_rotated_is_total_and_stable(monkeypatch):
    registry = {f"q{i}": i for i in range(100)}
    monkeypatch.setattr(entry, "_check_counts", lambda: ({}, set()))
    assert list(entry._rotated(registry)) == list(registry)  # no data → stable


def test_real_registry_first_50_are_least_checked():
    """Against the actual repo state: every name in the first 50 must
    have a check count <= every name outside the first 50."""
    q = entry.queries()
    counts, _ = entry._check_counts()
    names = list(q)
    head_max = max(counts.get(n, 0) for n in names[:50])
    tail_min = min(counts.get(n, 0) for n in names[50:])
    assert head_max <= tail_min
