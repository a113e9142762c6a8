"""Registry-rotation invariants (__spark_entry__._rotated).

The external checker samples the FIRST 50 registry entries per round,
so the rotation ordering is load-bearing: a regression here silently
starves half the registry of correctness rows.

Round-4 semantics: counts tally only hash-verified green rows (rows-only
``no_oracle`` checks and harness errors don't count), and within a count
group names WITHOUT an oracle sort after oracled names — an oracle-less
query can never go hash-green, so it must not pin a sample slot.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_rotated_orders_by_count_then_oracle_then_latest(monkeypatch):
    registry = {f"q{i}": i for i in range(6)}
    counts = {"q0": 2, "q1": 1, "q2": 1, "q3": 0, "q5": 2}
    latest = {"q1", "q5"}  # q1 checked most recently, q2 longer ago
    monkeypatch.setattr(entry, "_check_counts", lambda: (counts, latest))
    oracled = set(registry)  # all oracled -> same as pre-round-4 ordering
    order = list(entry._rotated(registry, oracled))
    # never-verified first (insertion order), then count-1 preferring the
    # one absent from the latest round, then count-2 likewise
    assert order == ["q3", "q4", "q2", "q1", "q0", "q5"]
    # values ride along untouched
    assert entry._rotated(registry, oracled)["q3"] == 3


def test_rows_only_names_yield_to_oracled_peers(monkeypatch):
    registry = {"a": 1, "b": 2, "c": 3}
    monkeypatch.setattr(entry, "_check_counts", lambda: ({}, set()))
    # 'a' has no oracle: same count group, but must sort after b and c
    assert list(entry._rotated(registry, {"b", "c"})) == ["b", "c", "a"]


def test_rotated_is_total_and_stable(monkeypatch):
    registry = {f"q{i}": i for i in range(100)}
    monkeypatch.setattr(entry, "_check_counts", lambda: ({}, set()))
    assert list(entry._rotated(registry, set(registry))) == list(registry)


def test_round_num_sorts_three_digit_rounds():
    paths = [f"CORRECTNESS_r{n}.json" for n in ("99", "100", "03")]
    assert sorted(paths, key=entry._round_num) == [
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r99.json",
        "CORRECTNESS_r100.json",
    ]


def test_check_counts_only_tallies_hash_green(tmp_path, monkeypatch):
    import json

    rows = {
        "green": {"hash_match": True, "err": None},
        "rows_only": {"hash_match": None, "err": "no_oracle"},
        "errored": {"hash_match": None, "err": "boom"},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    monkeypatch.setattr(entry, "_REPO", str(tmp_path))
    counts, latest = entry._check_counts()
    assert counts == {"green": 1}
    assert latest == {"green", "rows_only", "errored"}


def test_real_registry_first_50_are_least_verified():
    """Against the actual repo state: every name in the first 50 must
    have a verified count <= every name outside the first 50."""
    q = entry.queries()
    counts, _ = entry._check_counts()
    names = list(q)
    head_max = max(counts.get(n, 0) for n in names[:50])
    tail_min = min(counts.get(n, 0) for n in names[50:])
    assert head_max <= tail_min
