#!/usr/bin/env python
"""Reap stale entries from the persisted-artifact cache.

The content-keyed cache (functions/artifacts.py) never overwrites: a
corpus rewritten in place maps to a NEW key and the old index/merge-
table dir becomes a dead directory, and a builder that crashes mid-
train leaves an unmarked ``*.tmp.*`` scratch tree. Both classes are
"reapable by age" per the lifecycle contract — this tool is that reap.

Usage:
    python tools/reap_artifacts.py [--max-age-hours H] [--root DIR] [--dry-run]

Default horizon is 72 h: generous enough that an active round's warm
artifacts (rebuilt within minutes of corpus generation) always
survive, tight enough that dead keys from scale probes don't
accumulate across rounds. Pure local-FS walk — no Spark session.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nt_etl_order_book_spark.functions.artifacts import artifact_root, reap_stale


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-age-hours", type=float, default=72.0)
    ap.add_argument("--root", default=None, help="cache root (default: artifact_root())")
    ap.add_argument("--dry-run", action="store_true", help="list what would be reaped")
    args = ap.parse_args()

    root = args.root if args.root is not None else artifact_root()
    # One scan serves both modes (reap_stale's dry_run flag, r13
    # ADVICE): the listing can't drift from the real reap, and the
    # vanished-mid-scan OSError guard applies to both.
    reaped = reap_stale(args.max_age_hours, root=root, dry_run=args.dry_run)
    verb = "would reap" if args.dry_run else "reaped"
    for p in reaped:
        print(f"{verb}: {p}")
    print(f"{verb} {len(reaped)} stale entries under {root}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
