"""Grading-window rotation helper (r7/r8 sessions run this FIRST).

Automates the per-round procedure pinned in ``registry._WINDOW_PRIORITY``'s
comment and in BASELINE.md's retirement note:

1. Load the newest ``CORRECTNESS_r0N.json`` and verify its keys are
   EXACTLY the head of the current queue (the driver grades the first
   ~50 ids of ``queries()`` — any drift means the rotation contract
   broke and must be investigated, not auto-fixed).
2. Print the post-rotation queue (head deleted) as a formatted Python
   tuple ready to paste into ``registry._WINDOW_PRIORITY``, plus the
   round-number list to paste into
   ``test_window_priority_is_exactly_the_never_graded_ids``'s graded
   union.
3. After r8 drains the queue, print the dated RETIREMENT reminder
   instead (delete ``_WINDOW_PRIORITY`` entirely; r9+ windows re-sample
   already-graded ids in plain registration order).

Verification-only by design: it never edits ``registry.py`` itself, so a
human (or the building session) reviews the paste and the contract test
still enforces the invariant after the edit.

Usage:
    python tools/rotate_window.py            # auto-detect newest round
    python tools/rotate_window.py --round 6  # explicit
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--round",
        type=int,
        default=None,
        help="round number whose CORRECTNESS file to rotate out "
        "(default: newest CORRECTNESS_r0N.json present)",
    )
    args = ap.parse_args()

    from census_postgres_py_spark import registry

    rounds = sorted(
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    )
    rnd = args.round if args.round is not None else rounds[-1]
    path = os.path.join(ROOT, f"CORRECTNESS_r{rnd:02d}.json")
    graded_now = json.load(open(path))
    queue = list(registry._WINDOW_PRIORITY)

    head = queue[: len(graded_now)]
    if set(graded_now) != set(head):
        print(f"CONTRACT BROKEN: CORRECTNESS_r{rnd:02d} keys != queue head.")
        print("  graded-but-not-head:", sorted(set(graded_now) - set(head)))
        print("  head-but-not-graded:", sorted(set(head) - set(graded_now)))
        print(
            "Do NOT rotate mechanically — diff the driver's sampling "
            "against queries() order first."
        )
        return 1

    failures = {
        k: v
        for k, v in graded_now.items()
        if v.get("err") not in (None, "no_oracle") or v.get("hash_match") is False
    }
    if failures:
        print(f"WARNING: {len(failures)} graded ids not hash-green:")
        for k, v in failures.items():
            print(f"  {k}: {v}")
        print("Fix these BEFORE rotating (the bar is zero failures).")

    remaining = queue[len(graded_now):]
    print(
        f"CORRECTNESS_r{rnd:02d}: {len(graded_now)} ids == queue head — "
        f"rotation is safe. {len(remaining)} ids remain."
    )
    if not remaining:
        print(
            "\nQueue DRAINED. Per the retirement note in BASELINE.md "
            "(dated r5 VERDICT item 5): DELETE registry._WINDOW_PRIORITY "
            "and the special-casing in "
            "test_window_priority_is_exactly_the_never_graded_ids; "
            "queries() reverts to plain registration order and later "
            "windows re-sample already-graded ids."
        )
        return 0

    print("\nPaste into registry._WINDOW_PRIORITY:\n")
    print("_WINDOW_PRIORITY: tuple[str, ...] = (")
    for i in range(0, len(remaining), 4):
        chunk = ", ".join(f'"{x}"' for x in remaining[i : i + 4])
        print(f"    {chunk},")
    print(")")
    print(
        "\nThen in test_window_priority_is_exactly_the_never_graded_ids: "
        f"extend the graded-union round list to include {rnd}, and drop "
        "the sink_jdbc/mm_decode_features head special-case once this "
        "rotation removes them from the queue."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
