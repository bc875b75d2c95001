"""Paired-commit bench control (SCALE.md §10.2 method), scripted.

Benches HEAD and one or more reference commits back-to-back in ONE
quiet window — each commit's OWN bench.py, same host, same SF — then
writes BENCH_CONTROL.json adjudicating round-over-round deltas as
host-vs-code. Round 12's "23% improvement" and round 13's "1.4x slower
host" both turned out to be environment, not code; this control is how
every future delta gets decided instead of argued.

Usage:
  python scripts/bench_control.py <label>=<commit> [<label>=<commit> ...]
e.g.
  python scripts/bench_control.py r13_code=5198003

HEAD is always benched (label "head", from the repo itself, clean tree
assumed). Reference commits run from throwaway `git worktree`s under
.bench_worktrees/ (removed afterwards). The per-leg result is the LAST
stdout line of that commit's bench.py (the headline JSON; older
commits' bench attached the control object to the same line — stdout
here is uncapped, so it still parses).

Run this in a QUIET window: no pytest, no other Spark sessions.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_bench(workdir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=workdir, env=env,
        capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"bench failed in {workdir}:\n{out.stderr[-2000:]}")
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    doc = json.loads(lines[-1])
    # Prefer the full-precision detail line when present (head's bench
    # rounds the headline per-query values to 2 decimals for the
    # driver's tail capture).
    for ln in lines:
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "headline_queries_detail_sec":
            doc["queries"] = d["queries"]
    return doc


def main() -> None:
    legs_spec = [a.split("=", 1) for a in sys.argv[1:]]
    if not legs_spec:
        print("usage: bench_control.py <label>=<commit> ...", file=sys.stderr)
        sys.exit(2)

    head_commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()

    results: dict[str, dict] = {}
    commits = {"head": head_commit}
    # Median-of-N legs per commit, INTERLEAVED head/ref/head/ref/... so
    # slow host drift within the window hits both sides symmetrically
    # (r15 finding: a byte-identical leg drifted 1.064x across two
    # windows — single-leg controls read that as a code delta).
    rounds = int(os.environ.get("BENCH_CONTROL_ROUNDS", "3"))
    wt_base = os.path.join(REPO, ".bench_worktrees")
    os.makedirs(wt_base, exist_ok=True)
    wts: dict[str, str] = {}
    try:
        for label, commit in legs_spec:
            wt = os.path.join(wt_base, label)
            subprocess.run(["git", "worktree", "add", "--detach", wt, commit],
                           cwd=REPO, check=True, capture_output=True)
            wts[label] = wt
            commits[label] = commit
        samples: dict[str, list[dict]] = {lb: [] for lb in ["head", *wts]}
        for rnd in range(rounds):
            print(f"[control] round {rnd + 1}/{rounds}: head "
                  f"({head_commit}) at {SF_DIR}", file=sys.stderr)
            samples["head"].append(run_bench(REPO))
            for label, wt in wts.items():
                print(f"[control] round {rnd + 1}/{rounds}: {label} "
                      f"({commits[label]})", file=sys.stderr)
                samples[label].append(run_bench(wt))
        import statistics
        # ONE shared query set across every label's every leg: the
        # per-label medians, per-label leg totals and the headline
        # totals below must cover the SAME queries, or leg_totals_sec
        # silently sums different sets across labels (r16 advice —
        # per-label intersections could diverge when a commit adds or
        # renames a bench row).
        qnames: set | None = None
        for docs in samples.values():
            for d in docs:
                qnames = (set(d["queries"]) if qnames is None
                          else qnames & set(d["queries"]))
        qnames = qnames or set()
        for label, docs in samples.items():
            # fresh doc — carrying docs[0] verbatim left leg-0 scalar
            # fields (value/legacy_total_sec) beside median queries
            doc = {k: docs[0][k] for k in ("metric", "unit", "sf")
                   if k in docs[0]}
            doc["queries"] = {
                q: round(statistics.median(d["queries"][q] for d in docs), 3)
                for q in qnames}
            doc["value"] = round(sum(doc["queries"].values()), 3)
            doc["bench_legs"] = len(docs)
            doc["leg_totals_sec"] = [
                round(sum(d["queries"][q] for q in qnames), 3) for d in docs]
            results[label] = doc
    finally:
        for wt in wts.values():
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=REPO, capture_output=True)
        subprocess.run(["git", "worktree", "prune"], cwd=REPO,
                       capture_output=True)

    shared = set(results["head"]["queries"])
    for r in results.values():
        shared &= set(r["queries"])
    # Round 15: adjudicate steady-state and harness-dominated rows
    # SEPARATELY (both r14 control windows spent their budget
    # re-explaining the two per-micro-batch rows' host-weather swings).
    # Parse HARNESS_DOMINATED out of bench.py textually: importing the
    # module would pull in eventstorm_spark.session/pyspark (and mutate
    # sys.path) just to read a two-element list, and any import-time
    # failure beyond ImportError aborted the whole control run.
    try:
        import ast
        src = open(os.path.join(REPO, "bench.py")).read()
        _harness_rows = next(
            ast.literal_eval(node.value)
            for node in ast.walk(ast.parse(src))
            if isinstance(node, ast.Assign)
            and any(getattr(t, "id", None) == "HARNESS_DOMINATED"
                    for t in node.targets))
    except Exception:
        _harness_rows = ["bm25_served_from_index", "streaming_sessions"]
    harness_shared = shared & set(_harness_rows)
    steady_shared = shared - harness_shared
    legs = {}
    for label, r in results.items():
        legs[label] = {
            "commit": commits[label],
            "shared_total_sec": round(
                sum(r["queries"][q] for q in shared), 3),
            "steady_total_sec": round(
                sum(r["queries"][q] for q in steady_shared), 3),
            "harness_total_sec": round(
                sum(r["queries"][q] for q in harness_shared), 3),
            "bench_legs": r.get("bench_legs", 1),
            "leg_totals_sec": r.get("leg_totals_sec"),
        }
    shared_queries = {
        q: {f"{label}_sec": results[label]["queries"][q]
            for label in results}
        for q in sorted(shared)
    }
    out = {
        "method": ("SCALE.md 10.2 paired-commit control: HEAD and the "
                   "listed commits benched back-to-back in one quiet "
                   "window on this round's host (each commit's own "
                   f"bench.py, {SF_DIR}, local[32]); per-query values "
                   "are the MEDIAN over interleaved "
                   "head/ref/head/ref legs (r16: single-leg controls "
                   "read within-window drift as code); totals are over "
                   f"the {len(shared)}-query shared subset; "
                   "steady/harness totals split out the "
                   f"{sorted(harness_shared)} per-micro-batch rows "
                   "whose wall-clock tracks host weather, not code "
                   "(r14 control finding)."),
        "head_commit": head_commit,
        "legs": legs,
        "shared_queries": shared_queries,
    }
    path = os.path.join(REPO, "BENCH_CONTROL.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
    print(json.dumps({"control_written": path,
                      "legs": {k: v["shared_total_sec"]
                               for k, v in legs.items()}}))


if __name__ == "__main__":
    main()
