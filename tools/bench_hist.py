#!/usr/bin/env python
"""Benchmark-history harness: the reference's `make hist_*` analog.

The reference's tests/Makefile:100-121 checks out every past commit and
re-runs the BSR matvec benchmark, printing a time-per-commit regression
table (tests/bsr_hist.cpp).  This tool does the same over this repo's
history:

    python tools/bench_hist.py [--last N] [--all]

For each of the last N commits (default 10) that contain bench.py, it
runs the benchmark in a detached worktree and prints one row per metric.
Results are cached in .bench_hist.json keyed by commit, so re-runs only
measure new commits.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_hist.json")


def sh(*cmd, cwd=REPO, **kw):
    return subprocess.run(cmd, cwd=cwd, capture_output=True, text=True, **kw)


def bench_commit(commit: str, all_metrics: bool) -> dict:
    wt = f"/tmp/sbt_hist_{commit[:12]}"
    sh("git", "worktree", "add", "--detach", wt, commit)
    try:
        args = [sys.executable, "bench.py"] + (["--all"] if all_metrics else [])
        r = subprocess.run(args, cwd=wt, capture_output=True, text=True,
                           timeout=2700)
        out = {}
        for line in r.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    row = json.loads(line)
                    out[row["metric"]] = row
                except (ValueError, KeyError):
                    pass
        if not out:
            out["__error__"] = (r.stderr or r.stdout)[-500:]
        return out
    finally:
        sh("git", "worktree", "remove", "--force", wt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--last", type=int, default=10)
    ap.add_argument("--all", action="store_true",
                    help="run bench.py --all per commit")
    args = ap.parse_args()

    cache = {}
    if os.path.exists(CACHE):
        cache = json.load(open(CACHE))

    log = sh("git", "log", "--format=%H %s", f"-{args.last}").stdout
    rows = []
    for line in log.splitlines():
        commit, _, subject = line.partition(" ")
        has_bench = sh("git", "cat-file", "-e",
                       f"{commit}:bench.py").returncode == 0
        if not has_bench:
            continue
        key = commit + ("/all" if args.all else "")
        if key not in cache:
            print(f"benchmarking {commit[:12]} {subject[:50]} ...",
                  file=sys.stderr)
            cache[key] = bench_commit(commit, args.all)
            json.dump(cache, open(CACHE, "w"), indent=1)
        rows.append((commit, subject, cache[key]))

    metrics = sorted({m for _, _, res in rows for m in res
                      if not m.startswith("__")})
    hdr = "commit       " + "".join(f"{m[:26]:>28}" for m in metrics)
    print(hdr)
    for commit, subject, res in rows:
        cells = ""
        for m in metrics:
            v = res.get(m, {}).get("value")
            cells += f"{v:>28.1f}" if v is not None else f"{'-':>28}"
        print(f"{commit[:12]} {cells}   {subject[:44]}")


if __name__ == "__main__":
    main()
