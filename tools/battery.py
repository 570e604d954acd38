"""One-shot verification battery: every gate this repo ships, in order.

Usage: python tools/battery.py [--fast]

Runs (subprocesses, so each gets a clean JVM/session):
  1. full oracle sweep, normal session          (tools/check.py sf0.01)
  2. full oracle sweep, hostile non-UTC session (SPARK_CHECK_DRIVER_MIMIC=1)
  3. dtype audit across every oracle            (tools/check.py --dtypes)
  4. ANN recall audit vs the exact oracle       (tools/check.py --recall)
  5. entry() smoke (driver contract)
  6. pytest suite                                (skipped with --fast)
  7. bench.py one-liner                          (skipped with --fast)

Exit code 0 only if every stage passes. This is the closing discipline
from ROUND_NOTES, runnable as one command.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nt_etl_order_book_spark.tables import sf_path  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else sf_path("0.01")
FAST = "--fast" in sys.argv

ENTRY_SMOKE = (
    "import sys; sys.path.insert(0, %r); "
    "from nt_etl_order_book_spark.session import get_spark; "
    "import __spark_entry__ as e; "
    "n = e.entry(get_spark('battery-smoke')).count(); "
    "print('entry rows:', n); assert n > 0"
) % REPO

STAGES: list[tuple[str, list[str], dict[str, str]]] = [
    ("oracle sweep (normal)", [sys.executable, "tools/check.py", SF], {}),
    ("oracle sweep (driver-mimic)", [sys.executable, "tools/check.py", SF],
     {"SPARK_CHECK_DRIVER_MIMIC": "1"}),
    ("dtype audit", [sys.executable, "tools/check.py", "--dtypes", SF], {}),
    ("recall audit", [sys.executable, "tools/check.py", "--recall", SF], {}),
    ("entry smoke", [sys.executable, "-c", ENTRY_SMOKE], {}),
]
if not FAST:
    STAGES += [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], {}),
        ("bench", [sys.executable, "bench.py"], {}),
    ]


def main() -> int:
    failed = []
    for name, cmd, extra_env in STAGES:
        env = dict(os.environ, **extra_env)
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True)
        ok = proc.returncode == 0
        # Failing stages usually put the reason on stderr; a stdout tail
        # there would show an unrelated progress line on the FAIL row.
        primary = (proc.stdout if ok else proc.stderr) or proc.stdout or proc.stderr
        tail = primary.strip().splitlines()[-1:] or [""]
        print(f"{'PASS' if ok else 'FAIL'}  {name:28s} [{time.time()-t0:6.1f}s]  {tail[0][:120]}")
        if not ok:
            failed.append(name)
            sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:] + "\n")
    if failed:
        print(f"\nFAILED stages: {', '.join(failed)}")
        return 1
    print("\nall stages green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
