#!/usr/bin/env python
"""ADVISORY rotation audit (since round 11 the checked-50 ranking is
DERIVED AUTOMATICALLY at import time from the on-disk
CORRECTNESS_r*.json union — ella_spark/queries/__init__.py
_newest_greens/_reorder — so the per-round manual recompute this tool
used to drive no longer exists as a ritual).

Still useful per round for VISIBILITY: prints the newest-green
histogram, the due tier for the CURRENT round, and the per-round
new-query budget (how many oracle-paired queries can be added without
making the rotation unsatisfiable). The printed tier-set literals now
only document what the registry derives on its own.

Usage:
    python tools/rotation_audit.py
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

MAX_STALE = 3
BUDGET = 50


def newest_greens() -> tuple[dict[str, int], int]:
    """Reuses the registry's hardened parser (ella_spark.queries
    ._newest_greens — skips unreadable/truncated/non-dict payloads)
    so this tool survives exactly the damaged files the import does;
    only the max-round inference is local."""
    from ella_spark.queries import _newest_greens

    rounds = []
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", p.stem)
        if m:
            rounds.append(int(m.group(1)))
    if not rounds:
        sys.exit(
            "no CORRECTNESS_r*.json on disk — nothing to audit "
            "(round 1: every oracle-paired query is never-green and "
            "the prefix is simply the first 50 registrations)"
        )
    return _newest_greens(), max(rounds) + 1


def fmt_tier(names: list[str]) -> str:
    lines, cur = [], "    "
    for n in sorted(names):
        tok = f'"{n}",'
        if len(cur) + len(tok) + 1 > 76 and cur.strip():
            lines.append(cur.rstrip())
            cur = "    "
        cur += tok + " "
    if cur.strip():
        lines.append(cur.rstrip())
    return "\n".join(lines)


def main() -> None:
    import argparse

    from ella_spark.queries import all_oracles, all_queries

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--round",
        type=int,
        default=None,
        help="the round BEING BUILT. Default infers max(files)+1, "
        "which is only right BEFORE this round's CORRECTNESS file "
        "lands — pass it explicitly when re-auditing afterwards.",
    )
    args = ap.parse_args()
    newest, inferred = newest_greens()
    current = args.round if args.round is not None else inferred
    oracles = set(all_oracles())
    names = list(all_queries())
    hist = Counter(g for n, g in newest.items() if n in oracles)
    print(f"current round: {current}")
    print("newest-green histogram:", dict(sorted(hist.items())))

    never = sorted(n for n in names if n in oracles and n not in newest)
    print(f"never-green oracle-paired ({len(never)}):", never or "none")

    # a name OUTSIDE the prefix needs current - green <= MAX_STALE,
    # so the due tier is everything at green <= current - MAX_STALE - 1
    due_round = current - MAX_STALE - 1
    due = sorted(
        n for n, g in newest.items() if n in oracles and g <= due_round
    )
    print(f"\nDUE tier (green <= r{due_round}, MUST lead the prefix): "
          f"{len(due)} names")
    budget = BUDGET - len(due) - len(never)
    print(f"new-query budget this round: {budget}")
    if len(due) + len(never) > BUDGET:
        print("!! UNSATISFIABLE: due tier exceeds the prefix budget")

    print("\n# ready-to-paste tier sets (rename to match the round):")
    for g in sorted(set(newest.values())):
        tier = sorted(
            n for n, gg in newest.items() if gg == g and n in oracles
        )
        print(f"_R{g}_GREEN = {{\n{fmt_tier(tier)}\n}}\n")


if __name__ == "__main__":
    main()
