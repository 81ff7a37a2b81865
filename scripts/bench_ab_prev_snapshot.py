#!/usr/bin/env python
"""A/B bench against the previous round's snapshot — the standing
instrument for headline moves with no plan change to explain them
(VERDICT r9 ask #7; SCALE.md r9 bench-protocol note).

Why it exists: the r9 headline read 1.312x where r8's artifact read
1.127x, and the decisive evidence that this was HOST-DAY VARIANCE (not
a code regression) was a by-hand A/B — checking out the r8 snapshot in
a worktree and running both benches back-to-back on the same host in
the same hour (r8 code: 1.373x; r9 code: 1.333-1.341x under identical
conditions). This script makes that one command:

    python scripts/bench_ab_prev_snapshot.py            # vs last round tag
    python scripts/bench_ab_prev_snapshot.py --ref HEAD~5
    SPARK_GRAFT_SF_DIR=... python scripts/bench_ab_prev_snapshot.py

Protocol (same-host same-hour): snapshot bench first, current bench
second, each a fresh subprocess (own JVM, own DuckDB) in an otherwise
idle shell; the machine should be idle throughout (the long-bench tmux
rule applies — two full sf0.1 runs take ~15-20 min). The verdict is
the ratio-of-ratios: |log(current/snapshot)| under ~5% is host noise,
anything larger deserves a per-query diff.

Prints ONE JSON line: both headline blocks + the ratio-of-ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_round_snapshot() -> str:
    """The most recent driver end-of-round commit ('round N: ...')."""
    out = subprocess.run(
        ["git", "log", "--grep", r"^round [0-9]*:", "-n", "1",
         "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not out:
        raise SystemExit(
            "no 'round N:' snapshot commit found — pass --ref explicitly"
        )
    sha, _, subject = out.partition(" ")
    print(f"# snapshot: {sha[:12]} {subject}", file=sys.stderr)
    return sha


def _run_bench(workdir: str, label: str) -> dict:
    """Run bench.py in ``workdir``; return its tail headline JSON."""
    print(f"# running bench [{label}] in {workdir} ...", file=sys.stderr)
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=workdir,
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        print(proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"bench [{label}] failed (exit {proc.returncode})")
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    headline = json.loads(lines[-1])  # the tail-safe totals line
    print(f"# [{label}] {lines[-1]}", file=sys.stderr)
    return headline


def main() -> int:
    ap = argparse.ArgumentParser(
        description="bench the working tree vs a prior snapshot, "
                    "back-to-back on this host"
    )
    ap.add_argument(
        "--ref", default=None,
        help="git ref of the comparison snapshot (default: the last "
             "'round N:' commit)",
    )
    ap.add_argument(
        "--order", choices=("forward", "reversed", "both"),
        default="both",
        help="run order: forward = snapshot first; reversed = current "
             "first; both (default) = the r11 order-reversal control — "
             "forward then reversed, verdict = geometric mean of the "
             "two ratio-of-ratios (forward-only reads misled by "
             "10-25%% on this host, SCALE.md r11 note)",
    )
    args = ap.parse_args()
    ref = args.ref or _last_round_snapshot()
    sha = subprocess.run(
        ["git", "rev-parse", ref], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    wt = os.path.join(REPO, ".localdata", f"ab_snapshot_{sha[:12]}")
    fresh = not os.path.exists(wt)
    if fresh:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=REPO, check=True,
        )
    def ror(cur: dict, snap: dict) -> float | None:
        if snap.get("ratio") and cur.get("ratio"):
            return round(cur["ratio"] / snap["ratio"], 4)
        return None

    result: dict = {"metric": "ab_vs_prev_snapshot", "snapshot_ref": sha}
    try:
        if args.order in ("forward", "both"):
            # snapshot FIRST, current second — if anything warms the
            # host (page cache, CPU governor), it favors the side whose
            # number we are trying to defend against, not our own.
            snap = _run_bench(wt, f"snapshot {sha[:12]}")
            cur = _run_bench(REPO, "working tree")
            result["forward_order"] = {
                "snapshot_first": snap,
                "current_second": cur,
                "ratio_of_ratios": ror(cur, snap),
            }
        if args.order in ("reversed", "both"):
            cur_r = _run_bench(REPO, "working tree (first)")
            snap_r = _run_bench(wt, f"snapshot {sha[:12]} (second)")
            result["reversed_order"] = {
                "current_first": cur_r,
                "snapshot_second": snap_r,
                "ratio_of_ratios": ror(cur_r, snap_r),
            }
    finally:
        if fresh:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, check=False,
            )
    rors = [
        result[k]["ratio_of_ratios"]
        for k in ("forward_order", "reversed_order")
        if k in result and result[k]["ratio_of_ratios"]
    ]
    if rors:
        import math

        result["geometric_mean_ratio_of_ratios"] = round(
            math.exp(sum(math.log(r) for r in rors) / len(rors)), 4
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
