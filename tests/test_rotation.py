"""Machine-check of the driver-window rotation bookkeeping (VERDICT r7
item 3, extended each round per VERDICT r8 item 2).

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


def _r8_order():
    return E._r8_order(E._builders())


def test_r9_window_is_the_verdict_plan():
    """The r9 window is EXACTLY positions 50..99 of the r8
    registration order (VERDICT r8 item 1): the two r8 code-changed
    re-gates first, the remaining 15 r7-tail never-checked, then the
    33 oldest r4-evidence rows."""
    order = _order()
    win = order[:50]
    assert len(set(win)) == 50
    assert win == _r8_order()[50:100]
    # the two r8 code-changed queries lead
    assert win[:2] == list(E._R9_REGATE_FRONT)
    # all 17 r8-tail never-checked are in (backlog zeroed)
    assert set(E._R8_TAIL_NEVER) <= set(win)
    assert win[:17] == list(E._R8_TAIL_NEVER)
    # the 33 stale rows saw no driver row in r6/r7/r8
    stale = win[17:]
    recent = set(E._R6_WINDOW) | set(E._R7_WINDOW) | set(E._R8_WINDOW)
    assert not set(stale) & recent
    assert not set(stale) & set(E._R8_NEW) and not set(stale) & set(E._R9_NEW)


def test_r8_window_is_the_verdict_plan():
    """Historical pin: r8 window membership == all 36 _R7_TAIL_NEVER +
    first 14 _R7_NEW, code-changed first — matches the driver row."""
    win = list(E._R8_WINDOW)
    assert len(win) == 50 and len(set(win)) == 50
    assert set(win) == set(E._R7_TAIL_NEVER) | set(E._R7_NEW[:14])
    assert win[:len(E._R8_CODE_CHANGED)] == list(E._R8_CODE_CHANGED)
    assert set(E._R8_CODE_CHANGED) <= set(E._R7_NEW[:14])
    r8 = json.loads((REPO / "CORRECTNESS_r08.json").read_text())
    assert set(r8) == set(win)
    assert all(v["hash_match"] for v in r8.values())


def test_published_list_sizes():
    assert len(E._R6_NEW) == 62
    assert len(E._R6_TAIL_NEVER) == 24
    assert len(E._R7_NEW) == 31
    assert len(E._R7_TAIL_NEVER) == 36
    assert len(E._R7_WINDOW) == 50
    assert len(E._R8_TAIL_NEVER) == 17
    assert set(E._R8_TAIL_NEVER) == set(E._R7_NEW[14:])
    n_front = len(E._R9_REGATE_FRONT)
    assert E._R8_TAIL_NEVER[:n_front] == list(E._R9_REGATE_FRONT)
    # VERDICT r7 item 2 (standing): new-per-round cap
    assert len(E._R8_NEW) <= 15
    assert len(E._R9_NEW) <= 15
    # r9 code-changed bookkeeping: window members re-gate this round
    # automatically; every non-member leads the r10 window
    in_window = set(E._R9_CODE_CHANGED) & set(_order()[:50])
    rest = set(E._R9_CODE_CHANGED) - in_window - set(E._R8_NEW) - set(E._R9_NEW)
    assert rest == set(E._R10_REGATE_FRONT)


def test_windows_partition_history():
    """No query is in two consecutive windows unless code-changed, and
    the historical r7 window matches the recorded driver artifact."""
    assert not set(E._R7_WINDOW) & set(E._R8_WINDOW)
    win9 = set(_order()[:50])
    assert not win9 & set(E._R8_WINDOW)
    r7 = json.loads((REPO / "CORRECTNESS_r07.json").read_text())
    assert set(r7) == set(E._R7_WINDOW)
    assert all(v["hash_match"] for v in r7.values())


def test_registration_order_and_r10_readiness():
    order = _order()
    n = len(order)
    assert len(set(order)) == n
    # r9-new are registered at the very tail (rotate in by r11)
    k = len(E._R9_NEW)
    if k:
        assert order[n - k:] == list(E._R9_NEW)
    # positions 50..99 are the ready-made r10 window: the r9
    # code-changed re-gates first (r8-fresh rows changed this round,
    # then the code-changed members of _R8_NEW), then the rest of the
    # 6 r8-new never-checked, then the next-stalest r4/r5-era rows.
    r10 = order[50:100]
    front = list(E._R10_REGATE_FRONT)
    assert r10[:len(front)] == front
    assert set(E._R8_NEW) <= set(r10[:len(front) + len(E._R8_NEW)])
    rest = r10[len(front) + len(E._R8_NEW):]
    recent = (set(E._R6_WINDOW) | set(E._R7_WINDOW) | set(E._R8_WINDOW)
              | set(order[:50]))
    assert not set(rest) & recent


def test_staleness_ages_match_note():
    """Recompute the projected after-r9 evidence ages from the lists:
    50 r9-fresh / 49 r8 (minus the r10 regate pull-forward is still
    r8-evidence, so 50) / 50 r7 / 50 r6 / never = |_R8_NEW| + |_R9_NEW|,
    remainder r4/r5-era; total matches the registered surface."""
    order = _order()
    n = len(order)
    never = set(E._R8_NEW) | set(E._R9_NEW)
    ages = {
        "r9": set(order[:50]),
        "r8": set(E._R8_WINDOW),
        "r7": set(E._R7_WINDOW) - set(order[:50]),
        "r6": set(E._R6_WINDOW) - set(order[:50]),
        "never": never,
    }
    seen: set = set()
    for k, s in ages.items():
        assert not s & seen, k
        seen |= s
    assert len(ages["r9"]) == 50
    assert len(ages["r8"]) == 50
    assert len(ages["r7"]) == 50
    assert len(ages["r6"]) == 50
    assert len(ages["never"]) == len(E._R8_NEW) + len(E._R9_NEW)
    # everything else carries r4/r5-era evidence
    rest = set(order) - seen
    assert len(rest) == n - 200 - len(never)
    # after r9 the pre-r8 never-checked backlog is ZERO: every name
    # outside `never` appears in some recorded window
    assert rest <= set(_r8_order()[100:])
    # cycle-length invariant quoted in the note: ceil(N/50)
    assert -(-n // 50) == (n + 49) // 50


def test_oracle_coverage_of_registered_queries():
    """Every registered query has an oracle row (or is an allowlisted
    rows-only query) — the driver compare depends on this pairing."""
    order = _order()
    oracles = E.oracle_sql()
    missing = [q for q in order if q not in oracles]
    assert missing == [], missing
    assert not set(oracles) - set(order)


def test_every_registered_query_has_a_plan_snapshot():
    """Round-9 invariant: 100% plan-snapshot coverage, and no snapshot
    contains a CartesianProduct (the one operator that is never the
    right answer at 100 TB — bounded cross joins plan as
    BroadcastNestedLoopJoin and are separately allowlisted by the
    plan-invariant suite)."""
    docs = REPO / "docs"
    missing = [n for n in _order()
               if not (docs / f"plan_{n}.txt").exists()]
    assert missing == [], missing
    offenders = [p.name for p in docs.glob("plan_*.txt")
                 if "CartesianProduct" in p.read_text()]
    assert offenders == [], offenders
