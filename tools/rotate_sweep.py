"""Compute the next round's `registry._SWEEP_PRIORITY` mechanically.

The driver sweeps the FIRST 50 registered queries each round, so the
rotation discipline is: stalest first (never-driver-swept queries from
the outgoing round's queue, then oldest last-green round), everything
else behind. This tool reads the CORRECTNESS_r*.json history plus the
live registry and prints a ready-to-paste tuple — the builder's only
manual step is promoting queries whose impl/oracle CHANGED this round
into the window (the tool can't know that from history alone; list
them as arguments).

Usage: python tools/rotate_sweep.py [changed_query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nt_etl_order_book_spark.registry import all_specs

SWEEP_CAP = 50


def driver_rows(repo: str) -> tuple[dict[str, int], int]:
    last: dict[str, int] = {}
    latest = 0
    for name in sorted(os.listdir(repo)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(os.path.join(repo, name)) as fh:
            for q in json.load(fh):
                last[q] = max(last.get(q, 0), rnd)
    return last, latest


def main() -> int:
    changed = sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last, latest = driver_rows(repo)
    names = list(all_specs())
    unknown = [c for c in changed if c not in names]
    if unknown:
        print(f"ERROR: not registered: {unknown}", file=sys.stderr)
        return 1
    # Order: changed-this-round first (need fresh rows for new semantics),
    # then never-swept, then ascending last-green round; the current
    # registry iteration order (itself the previous rotation) is the
    # stable tiebreak throughout.
    reg_pos = {n: i for i, n in enumerate(names)}
    prio = sorted(
        names,
        key=lambda n: (
            0 if n in changed else 1,
            last.get(n, -1),  # never-swept (-1) before any real round
            reg_pos[n],
        ),
    )
    window, queue = prio[:SWEEP_CAP], prio[SWEEP_CAP:]
    print(f"# r{latest + 1} window (slots 1-{SWEEP_CAP}); history through r{latest}")
    print(f"_SWEEP_ROTATED_FOR_ROUND = {latest + 1}")
    print()
    # Changed queries displace up to len(changed) stalest queries just
    # past the cap; tests/test_registry_rotation.py waives exactly that
    # bounded, queued-next displacement, keyed off _SWEEP_CHANGED — paste
    # this tuple alongside the priority (reset to () on rotations with no
    # semantic changes).
    print("_SWEEP_CHANGED: tuple[str, ...] = (")
    for n in changed:
        print(f'    "{n}",')
    print(")")
    print()
    print("_SWEEP_PRIORITY: tuple[str, ...] = (")
    for n in window:
        tag = "changed" if n in changed else (f"last r{last[n]}" if n in last else "never swept")
        print(f'    "{n}",  # {tag}')
    print(f"    # ---- slot {SWEEP_CAP + 1}+: next-round queue ----")
    for n in queue:
        if last.get(n, 0) < latest:  # only worth listing if it will be stale
            tag = f"last r{last[n]}" if n in last else "never swept"
            print(f'    "{n}",  # {tag}')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
