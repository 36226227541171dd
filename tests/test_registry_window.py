"""Guard: every registry entry the external driver has never certified
must sit inside the driver's CORRECTNESS check window.

The round driver verifies only the first ``DRIVER_WINDOW`` entries of
``discoverx_spark.queries.QUERIES`` against its DuckDB oracle (observed:
50 rows in CORRECTNESS_r01..r03 over an 80-entry registry).  An entry
appended past that window would look green locally (the exhaustive
tests/test_oracle_parity.py harness checks all entries) while never
earning a driver-written CORRECTNESS row.  This test recomputes the
never-certified set from the CORRECTNESS_r*.json artifacts on disk and
fails if any such entry sits outside the window — so growing the
registry forces an explicit re-prioritisation instead of silently
parking new operators in the blind spot.
"""

from __future__ import annotations

import glob
import json
import os

from discoverx_spark.queries import DRIVER_WINDOW, QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_green_names() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # oracle-backed rows carry hash_match; a False there means the
            # driver compared values and they hashed differently — NOT
            # certified even though row counts lined up (the r04 HUGEINT
            # lesson).  Rows-only checks (no oracle SQL) omit hash_match.
            if (row.get("err") is None and row.get("rows_match")
                    and row.get("hash_match") is not False):
                green.add(name)
    return green


def test_never_certified_entries_inside_driver_window():
    green = _driver_green_names()
    assert green, "no CORRECTNESS_r*.json artifacts found — cannot guard"
    order = list(QUERIES)
    stragglers = [
        (pos, name)
        for pos, name in enumerate(order)
        if name not in green and pos >= DRIVER_WINDOW
    ]
    assert not stragglers, (
        f"registry entries without a driver-green CORRECTNESS row sit "
        f"outside the first {DRIVER_WINDOW} positions and will never be "
        f"certified: {stragglers} — reorder QUERIES (see "
        f"_reorder_for_driver_window in discoverx_spark/queries.py)"
    )


def test_window_front_is_never_certified_then_sentinels():
    # the promotion must not drop or duplicate entries
    order = list(QUERIES)
    assert len(order) == len(set(order))
    green = _driver_green_names()
    never = [n for n in order if n not in green]
    # every never-certified entry is inside the window
    for n in never:
        assert order.index(n) < DRIVER_WINDOW
