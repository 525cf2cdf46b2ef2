#!/usr/bin/env python3
"""Assemble a CORRECTNESS_*.json artifact from one tools/check.py log:
reads the per-query '✓ name: N rows' lines and PASS=/FAIL= total of a
SINGLE contiguous run, so the artifact is auditable from one log.

Usage: mk_correctness_artifact.py <check_log> <sf_desc> <comment> <out.json>
"""
import json
import re
import sys


def main(log_path: str, sf_desc: str, comment: str, out_path: str) -> int:
    rows = {}
    n_pass = n_fail = None
    n_runs = 0
    fails = []
    with open(log_path) as f:
        for line in f:
            m = re.match(r"\s*✓ (\S+): (\d+) rows", line)
            if m:
                rows[m.group(1)] = int(m.group(2))
                continue
            if re.match(r"\s*✗ ", line):
                fails.append(line.strip()[:200])
            m = re.match(r"PASS=(\d+) FAIL=(\d+)", line)
            if m:
                n_pass, n_fail = int(m.group(1)), int(m.group(2))
                n_runs += 1
    if n_pass is None:
        print("no PASS= line found — incomplete run?", file=sys.stderr)
        return 1
    if n_runs > 1:
        # the artifact's premise is ONE contiguous run: multiple PASS= lines
        # mean a pieced log, whose merged per-query rows could masquerade as
        # a single-run result — refuse rather than silently take the last
        print(f"{n_runs} PASS= lines found — log contains multiple runs; "
              "pass a single contiguous check.py log", file=sys.stderr)
        return 1
    art = {
        "comment": comment,
        "sf_dir": sf_desc,
        "pass": n_pass,
        "fail": n_fail,
        "spark_rows": dict(sorted(rows.items())),
    }
    if fails:
        art["failures"] = fails
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"{out_path}: pass={n_pass} fail={n_fail} queries={len(rows)}")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    if len(sys.argv) != 5:
        print("usage: mk_correctness_artifact.py <check_log> <sf_desc> "
              "<comment> <out.json>", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:5]))
