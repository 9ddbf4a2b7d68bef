#!/usr/bin/env python
"""Run the FULL test suite (slow lane included) and record the result as a
per-round artifact (VERDICT r4 #5: `make test-all` passing must be recorded,
not just claimed).

Usage: python tools/run_test_all.py [--round N] [--fast]

Writes results/test_all_r{N}.json: {passed, failed, skipped, wall_s,
git_sha, cmd}.  --fast records the default gate instead (slow lane
excluded) under results/test_fast_r{N}.json.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if args.fast:
        cmd += ["-m", "not slow"]  # the default `make test` gate
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    wall = time.time() - t0
    tail = (proc.stdout or "").strip().splitlines()[-30:]
    counts = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
    for line in reversed(tail):
        m = re.findall(r"(\d+) (passed|failed|skipped|error)", line)
        if m:
            for n, k in m:
                counts[k] = int(n)
            break
    rec = {"round": args.round, "git_sha": sha, "cmd": " ".join(cmd),
           "rc": proc.returncode, "wall_s": round(wall, 1), **counts,
           "tail": tail[-3:]}
    name = f"test_{'fast' if args.fast else 'all'}_r{args.round}.json"
    dest = os.path.join(REPO, "results", name)
    if proc.returncode != 0:
        # keep the evidence: the JSON tail alone cannot diagnose a failure
        with open(dest.replace(".json", ".log"), "w") as f:
            f.write(proc.stdout or "")
            f.write(proc.stderr or "")
    with open(dest, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
