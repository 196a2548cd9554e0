"""Driver-evidence staleness report.

For every catalog query, print the round of its most recent driver
check (CORRECTNESS_r*.json), whether that check is stale (the query was
rewritten afterward — it sits in _CHANGED_THIS_ROUND), and how the next
driver window (first 50 of queries() order) will land. Usage::

    python tools/staleness.py            # histogram + projected window
    python tools/staleness.py --full     # plus the per-query table
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def tier0_overflow(ordered: list[str], changed: set[str]) -> list[str]:
    """The rewritten-since-last-check queries the next WINDOW-slot driver
    pass will NOT reach — always computed, never hand-written."""
    return [n for n in ordered[WINDOW:] if n in changed]


def summary_line(ordered: list[str], changed: set[str]) -> str:
    """One-line tier-0 bookkeeping: size / window / overflow."""
    return (
        f"tier0: {len(changed)} rewritten-unchecked; window: {WINDOW}; "
        f"overflow: {len(tier0_overflow(ordered, changed))}"
    )


def main() -> None:
    import __spark_entry__ as entry

    ordered = list(entry.queries())
    changed = set(entry._CHANGED_THIS_ROUND)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_round: dict[str, int] = {}
    last_ok: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for k, v in rows.items():
            ok = bool(
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            )
            if rnd >= last_round.get(k, -1):
                last_round[k] = rnd
                last_ok[k] = ok

    hist: dict[str, int] = {}
    for name in ordered:
        if name in changed:
            key = "stale (rewritten after last check)"
        elif name not in last_round:
            key = "never checked"
        elif not last_ok[name]:
            key = f"RED at r{last_round[name]}"
        else:
            key = f"green r{last_round[name]}"
        hist[key] = hist.get(key, 0) + 1

    # The canonical bookkeeping line — __spark_entry__.py's tier-0
    # comment must NOT hand-write these numbers (r11 verdict #2); this
    # computed line is the source of truth, pinned by
    # tests/test_staleness_report.py.
    print(summary_line(ordered, changed))

    print(f"catalog: {len(ordered)} queries; driver window: {WINDOW}")
    for key in sorted(hist):
        print(f"  {hist[key]:4d}  {key}")

    window = ordered[:WINDOW]
    in_win_changed = sum(1 for n in window if n in changed)
    print(
        f"next window: {in_win_changed} rewritten-this-round + "
        f"{WINDOW - in_win_changed} cohort-refresh slots"
    )
    overflow = tier0_overflow(ordered, changed)
    if overflow:
        print(f"tier-0 OVERFLOW ({len(overflow)} rewritten queries miss the window):")
        for n in overflow:
            print(f"  - {n}")

    # Forward rotation plan (r11 verdict "Next round" #3): project the
    # round AFTER next under the standing freeze — assume the next
    # driver window drains the first WINDOW entries (tier-0 head) and
    # nothing new enters tier-0; the following window then takes the
    # stalest cohorts first. The projection shows when every query's
    # evidence returns to <=2 rounds old.
    drained = set(ordered[:WINDOW])
    nxt = max(last_round.values(), default=0) + 1
    proj_round: dict[str, int] = dict(last_round)
    for n in drained:
        proj_round[n] = nxt
    remaining = [n for n in ordered if n not in drained]
    # stalest-first among the rest (CHANGED leftovers outrank cohorts)
    remaining.sort(
        key=lambda n: (
            0 if n in changed else 1,
            proj_round.get(n, -1),
        )
    )
    window2 = remaining[:WINDOW]
    hist2: dict[str, int] = {}
    for n in window2:
        k = "tier-0 leftover" if n in changed else f"cohort r{proj_round.get(n, 0)}"
        hist2[k] = hist2.get(k, 0) + 1
    print(f"projected window r{nxt + 1} (stalest-first after r{nxt} drains tier-0):")
    for k in sorted(hist2):
        print(f"  {hist2[k]:4d}  {k}")
    after = sorted(
        proj_round.get(n, 0) for n in ordered if n not in drained and n not in set(window2)
    )
    oldest_left = after[0] if after else nxt
    print(
        f"after r{nxt + 1}: oldest remaining evidence r{oldest_left} "
        f"({nxt + 1 - oldest_left} rounds stale)"
    )

    if "--full" in sys.argv:
        print()
        for name in ordered:
            mark = "CHANGED" if name in changed else (
                f"r{last_round[name]}" if name in last_round else "never"
            )
            print(f"  {name:45s} {mark}")


if __name__ == "__main__":
    main()
