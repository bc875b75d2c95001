"""Interleaved A/B subset bench: the working tree vs a reference commit.

Usage: python scripts/ab_subset.py <ref_commit> <query> [query ...]

Runs scripts/bench_subset.py alternately from the working tree ("now")
and from a throwaway worktree at <ref_commit> ("ref"),
$AB_ROUNDS (default 4) rounds in one window, and prints per-query
medians plus every leg — the same interleaved-median discipline as
bench_control.py, scoped to a handful of queries so a single change can
be adjudicated in minutes instead of a full-bench hour. Honors
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(workdir: str, names: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join("scripts", "bench_subset.py"), *names],
        cwd=workdir, env=dict(os.environ), capture_output=True, text=True,
        timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"leg failed in {workdir}:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["queries"]


def main() -> None:
    ref, names = sys.argv[1], sys.argv[2:]
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    wt = os.path.join(REPO, ".bench_worktrees", "ab_ref")
    subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO,
                   capture_output=True)
    subprocess.run(["git", "worktree", "add", "--detach", wt, ref],
                   cwd=REPO, check=True, capture_output=True)
    # the ref worktree may predate bench_subset.py — copy the CURRENT
    # harness scripts in (they only drive inventory.queries())
    os.makedirs(os.path.join(wt, "scripts"), exist_ok=True)
    for f in ("bench_subset.py",):
        src = os.path.join(REPO, "scripts", f)
        dst = os.path.join(wt, "scripts", f)
        open(dst, "w").write(open(src).read())
    try:
        legs: dict[str, list[dict]] = {"now": [], "ref": []}
        for rnd in range(rounds):
            for label, cwd in (("now", REPO), ("ref", wt)):
                print(f"[ab] round {rnd + 1}/{rounds} {label}",
                      file=sys.stderr)
                legs[label].append(run_leg(cwd, names))
        med = {
            label: {q: round(statistics.median(d[q] for d in ds), 3)
                    for q in names}
            for label, ds in legs.items()}
        print(json.dumps({
            "medians": med,
            "speedup_ref_over_now": {
                q: round(med["ref"][q] / med["now"][q], 3)
                if med["now"][q] else None for q in names},
            "legs": {label: [{q: round(d[q], 3) for q in names} for d in ds]
                     for label, ds in legs.items()},
        }, indent=1))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        subprocess.run(["git", "worktree", "prune"], cwd=REPO,
                       capture_output=True)


if __name__ == "__main__":
    main()
