#!/usr/bin/env python3
"""A/B bench drift protocol — makes a round-over-round BENCH delta
self-adjudicating (NEXT.md round-4 note: the same commit measured
4.32 s and 5.18 s on the same box hours apart, loadavg < 0.1 both
times; without an interleaved A/B there is no way to tell machine
drift from a code regression).

Usage:
    python tools/bench_ab.py <baseline-ref> [reps]

Checks out ``<baseline-ref>`` into a temporary git worktree, then runs
``python bench.py`` ALTERNATELY (A B A B ...) ``reps`` times per side
— interleaving is the point: slow machine phases hit both sides
equally instead of biasing whichever ran second. Each run is a fresh
process/JVM (bench.py builds its own session), runs are sequential
(never two local[*] JVMs at once), and the per-query medians plus the
A/B total ratio are printed as one JSON line at the end:

    {"a_ref": ..., "b_ref": "WORKTREE", "a_total": ..., "b_total": ...,
     "ratio_b_over_a": ..., "queries": {name: {"a": ..., "b": ...}}}

Reading it: ratio ≈ 1.0 → any delta vs the committed BENCH file is
machine drift; ratio meaningfully > 1 → the working tree regressed
vs the baseline ref on THIS box RIGHT NOW.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str) -> dict:
    """One bench.py run in ``tree``; returns the parsed JSON line."""
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench output from {tree}")


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    ref = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sha = subprocess.run(
        ["git", "rev-parse", "--short", ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = f"/tmp/bench_ab_{sha}"
    subprocess.run(
        ["git", "worktree", "add", "--force", wt, ref],
        cwd=REPO, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        a_runs: list[dict] = []  # baseline ref
        b_runs: list[dict] = []  # working tree
        for i in range(reps):
            print(f"-- rep {i + 1}/{reps}: A ({sha})", file=sys.stderr)
            a_runs.append(run_bench(wt))
            print(f"-- rep {i + 1}/{reps}: B (worktree)", file=sys.stderr)
            b_runs.append(run_bench(REPO))
        names = sorted(a_runs[0]["queries"])
        qmed = {
            n: {
                "a": round(statistics.median(r["queries"][n] for r in a_runs), 4),
                "b": round(statistics.median(r["queries"][n] for r in b_runs), 4),
            }
            for n in names
            if all(n in r["queries"] for r in a_runs + b_runs)
        }
        a_total = round(statistics.median(r["value"] for r in a_runs), 4)
        b_total = round(statistics.median(r["value"] for r in b_runs), 4)
        print(json.dumps({
            "a_ref": sha,
            "b_ref": "WORKTREE",
            "reps": reps,
            "a_total": a_total,
            "b_total": b_total,
            "ratio_b_over_a": round(b_total / a_total, 4) if a_total else None,
            "queries": qmed,
        }))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], cwd=REPO, check=False
        )


if __name__ == "__main__":
    main()
