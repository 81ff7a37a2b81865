"""The end-of-round full-suite gate, mechanized (ADVICE r12: the
`-m "not slow"` default trim must not degrade into a place where
failures hide behind convention).

Runs BOTH suite halves exactly as the round protocol prescribes —
the default loop (`-m "not slow"`, the fast demotion backstop) and
the slow-marked half (`-m slow`, the heavy fuzz/statistical/property
claims) — and writes ONE artifact, FULLSUITE.json, with pass/fail
counts, wall-clock, and the git commit it ran against. A round whose
FULLSUITE.json is missing, red, or stamped with a stale commit has
NOT satisfied the end-of-round rule; the artifact makes that check
mechanical instead of conventional. Stamp semantics: the artifact
records the code commit the suites EXECUTED against, and is then
committed in a follow-up artifact commit — so a valid FULLSUITE.json
is stamped with its committing commit's PARENT (it cannot contain
its own hash), and "stale" means the stamp is not an ancestor-of-or-
equal-to the round's last code-touching commit.

Usage:
    python scripts/run_full_suite.py          # both halves, ~25 min
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_half(marker_expr: str) -> dict:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", marker_expr],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    wall = round(time.perf_counter() - t0, 1)
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    counts = dict.fromkeys(("passed", "failed", "error", "skipped"), 0)
    for n, kind in re.findall(r"(\d+) (passed|failed|error|skipped)", tail):
        counts[kind] = int(n)
    last = tail.splitlines()[-1] if tail else "(no pytest stdout)"
    print(f"# [{marker_expr or 'ALL'}] {last}", file=sys.stderr)
    return {
        "marker": marker_expr,
        "exit_code": proc.returncode,
        "wall_sec": wall,
        **counts,
        "summary": tail.splitlines()[-1] if tail else "",
    }


def main() -> int:
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True,
        ).stdout.strip()
    )
    halves = [run_half("not slow"), run_half("slow")]
    record = {
        "gate": "full_suite",
        "commit": commit,
        "working_tree_dirty": dirty,
        "halves": halves,
        "total_passed": sum(h["passed"] for h in halves),
        "total_failed": sum(h["failed"] + h["error"] for h in halves),
        "total_skipped": sum(h["skipped"] for h in halves),
        "green": all(h["exit_code"] == 0 for h in halves),
    }
    with open(os.path.join(REPO, "FULLSUITE.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    return 0 if record["green"] else 1


if __name__ == "__main__":
    sys.exit(main())
