"""Warm the persistent compile cache for the test lane, safely.

The default lane (tests/conftest.py) never writes the persistent cache:
XLA's native `executable.serialize()` segfaults once a process has
hundreds of compiles behind it (round-3/4 verdicts — the detonation site
moves with the write schedule, so it cannot be fixture-gated). Cache
WRITES are therefore done here, from one SHORT-LIVED pytest subprocess
per test file: each subprocess compiles only its own file's programs,
serializes them while its heap is young, and exits. A file whose
subprocess still crashes is reported (its entries just stay unwarmed —
the default lane is unaffected either way).

Usage:  python scripts/warm_test_cache.py [pytest-selector ...]
        (default: every tests/test_*.py, slow lane included so RUN_SLOW
        runs are warm too; pass file paths to warm a subset)
"""
from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    targets = sys.argv[1:] or sorted(
        str(p.relative_to(ROOT)) for p in (ROOT / "tests").glob("test_*.py"))
    env = dict(os.environ, CCGP_CACHE_WRITES="1", RUN_SLOW="1")
    failures = []
    for t in targets:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", t, "-q", "--no-header", "-p",
             "no:cacheprovider"],
            cwd=ROOT, env=env, capture_output=True, text=True)
        dt = time.time() - t0
        tail = (r.stdout or r.stderr).strip().splitlines()
        status = "ok" if r.returncode == 0 else f"EXIT {r.returncode}"
        print(f"{t}: {status} ({dt:.0f}s)  {tail[-1] if tail else ''}",
              flush=True)
        if r.returncode != 0:
            failures.append(t)
    if failures:
        print(f"unwarmed (subprocess failed): {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
