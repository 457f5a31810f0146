"""Machine-check of the driver-window rotation bookkeeping (VERDICT r7
item 3).

The registration-order machinery in ``__spark_entry__.py`` is ~120
lines of list arithmetic whose invariants previously lived only in
comments — and drifted once (ADVICE r6 low).  This test recomputes
window membership, backlog counts, and staleness ages from the ``_R*``
lists themselves and fails if the published numbers drift again.

The driver hash-checks exactly the FIRST 50 registered queries, so
``list(queries())[:50]`` IS the round's correctness window.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as E

REPO = Path(__file__).resolve().parent.parent


def _order():
    return list(E.queries())


def test_r8_window_is_the_verdict_plan():
    """Window membership == all 36 _R7_TAIL_NEVER + first 14 _R7_NEW,
    with the two code-changed queries re-gated first."""
    win = list(E._R8_WINDOW)
    assert len(win) == 50 and len(set(win)) == 50
    assert set(win) == set(E._R7_TAIL_NEVER) | set(E._R7_NEW[:14])
    assert win[:len(E._R8_CODE_CHANGED)] == list(E._R8_CODE_CHANGED)
    # the code-changed pair are genuinely members of the planned
    # first-14 (membership unchanged, only ordering pulled forward)
    assert set(E._R8_CODE_CHANGED) <= set(E._R7_NEW[:14])


def test_published_list_sizes():
    assert len(E._R6_NEW) == 62
    assert len(E._R6_TAIL_NEVER) == 24
    assert len(E._R7_NEW) == 31
    assert len(E._R7_TAIL_NEVER) == 36
    assert len(E._R7_WINDOW) == 50
    assert len(E._R8_TAIL_NEVER) == 17
    assert set(E._R8_TAIL_NEVER) == set(E._R7_NEW[14:])
    # r8 code-changed tail queries lead the r9 window's re-gate group
    n_front = len(E._R9_REGATE_FRONT)
    assert E._R8_TAIL_NEVER[:n_front] == list(E._R9_REGATE_FRONT)
    assert set(E._R9_REGATE_FRONT) <= set(E._R7_NEW[14:])
    # VERDICT r7 item 2: new-per-round cap
    assert len(E._R8_NEW) <= 15


def test_windows_partition_history():
    """No query is in two consecutive windows unless code-changed, and
    the historical r7 window matches the recorded driver artifact."""
    assert not set(E._R7_WINDOW) & set(E._R8_WINDOW)
    r7 = json.loads((REPO / "CORRECTNESS_r07.json").read_text())
    assert set(r7) == set(E._R7_WINDOW)
    assert all(v["hash_match"] for v in r7.values())


def test_registration_order_and_r9_readiness():
    order = _order()
    n = len(order)
    assert len(set(order)) == n
    assert order[:50] == list(E._R8_WINDOW)
    assert order[50:67] == list(E._R8_TAIL_NEVER)
    # r8-new are registered at the very tail
    assert order[n - len(E._R8_NEW):] == list(E._R8_NEW)
    # positions 50..99 are the ready-made r9 window: the 17 never-
    # checked + 33 stale rows, none of which saw a driver row in
    # r6/r7/r8 (i.e. their newest evidence is r4/r5-era).
    r9 = order[50:100]
    recent = set(E._R6_WINDOW) | set(E._R7_WINDOW) | set(E._R8_WINDOW)
    assert not set(r9) & recent
    assert not set(r9) & set(E._R8_NEW)


def test_staleness_ages_match_note():
    """Recompute the projected after-r8 evidence ages from the lists:
    50 r8-fresh / 50 r7 / 50 r6 / never = 17 + |_R8_NEW|, remainder
    r4/r5-era; and the total matches the registered surface."""
    order = _order()
    n = len(order)
    never = set(E._R8_TAIL_NEVER) | set(E._R8_NEW)
    ages = {
        "r8": set(E._R8_WINDOW),
        "r7": set(E._R7_WINDOW),
        "r6": set(E._R6_WINDOW),
        "never": never,
    }
    # the four buckets are disjoint
    seen: set = set()
    for k, s in ages.items():
        assert not s & seen, k
        seen |= s
    assert len(ages["r8"]) == 50
    assert len(ages["r7"]) == 50
    assert len(ages["r6"]) == 50
    assert len(ages["never"]) == 17 + len(E._R8_NEW)
    # everything else carries r4/r5-era evidence
    rest = set(order) - seen
    assert len(rest) == n - 167 - len(E._R8_NEW)
    # cycle-length invariant quoted in the note: ceil(N/50)
    assert -(-n // 50) == (n + 49) // 50


def test_oracle_coverage_of_registered_queries():
    """Every registered query has an oracle row (or is an allowlisted
    rows-only query) — the driver compare depends on this pairing."""
    order = _order()
    oracles = E.oracle_sql()
    missing = [q for q in order if q not in oracles]
    # rows-only queries (non-SQL-expressible) must be a deliberate,
    # named set — none currently
    assert missing == [], missing
    # no orphan oracles either
    assert not set(oracles) - set(order)
