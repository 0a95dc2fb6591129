#!/usr/bin/env python3
"""Full-surface correctness gate at the x10 replica -> CORRECTNESS_x10.json.

The driver gates correctness at sf0.001/0.01/0.1; this runs the ENTIRE
query surface one decade further out (/tmp/graft_sf1: 1.5M orders / 6M
lineitems / 50k docs / 20k vectors) to catch scale-dependent divergence
(overflow, rounding boundaries, recall-pin flips) a decade before the
driver would.

Exclusions, all mechanical and recorded in the artifact:
  - EXCLUDE_SPARK: queries whose SPARK side is a deliberately-O(n^2)
    brute-force baseline that is infeasible at 50k docs by design (the
    scale path over the same contract IS gated here).
  - oracle timeouts: check_oracle.py runs each DuckDB oracle under a
    per-query timeout; the brute-pair oracles (2.5G-pair CTEs) report
    `skip` -- their queries are gated at the driver SFs where the brute
    oracle is feasible.

Usage: python3 tools/gate_x10.py [x10_dir] [oracle_timeout_sec]
Writes CORRECTNESS_x10.json to the repo root; exits nonzero on any FAIL.
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/verify_x10"
EXCLUDE_SPARK = {
    "q34_jaccard_dupes":
        "deliberate O(n^2) brute-force Jaccard baseline: 1.25G "
        "set-intersection pairs at 50k docs, infeasible at this scale by "
        "design; the LSH scale paths over the same contract (q35/q174) "
        "are gated here",
    "q45_embedding_neardup":
        "deliberate O(n^2) brute cosine baseline (200M pairs); the "
        "bucketed scale path over the same contract (q84) is gated here",
}


def main():
    args = [a for a in sys.argv[1:] if a != "--no-verify"]
    # --no-verify: reuse an existing, freshly-produced Verify dump in OUT
    # (e.g. when the long sbt run completed in a prior invocation and only
    # the DuckDB compare + artifact write remain).
    skip_verify = "--no-verify" in sys.argv[1:]
    x10 = args[0] if len(args) > 0 else "/tmp/graft_sf1"
    timeout = args[1] if len(args) > 1 else "60"
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    if not skip_verify:
        subprocess.check_call(
            ["sbt", "-batch",
             f"runMain graft.Verify {x10} {OUT} -" +
             ",".join(sorted(EXCLUDE_SPARK))],
            cwd=REPO, env=env)
    # drop excluded queries from the oracle set so the compare doesn't
    # fail on their (intentionally) missing result dirs
    osql = json.load(open(f"{OUT}/oracle_sql.json"))
    for q in EXCLUDE_SPARK:
        osql.pop(q, None)
    json.dump(osql, open(f"{OUT}/oracle_sql.json", "w"))
    # stream the checker's per-query lines as they happen (a brute oracle
    # can hold one query for its full timeout — a buffered capture looks
    # like a hang from outside)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         x10, OUT, timeout],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    lines = []
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        lines.append(line)
    proc.wait()
    # re.search, not re.match: DuckDB progress-bar fragments can prefix a
    # verdict line (the round-8 artifact silently dropped 9 skips to an
    # anchored match; the checker now disables the bar, this is the belt)
    result = {}
    for line in lines:
        m = re.search(r"ok   (q\S+) \((\d+) rows\)", line)
        if m:
            result[m.group(1)] = {"status": "ok", "rows": int(m.group(2))}
            continue
        m = re.search(r"skip (q\S+): (.*)", line)
        if m:
            result[m.group(1)] = {"status": "skip", "note": m.group(2)}
            continue
        m = re.search(r"FAIL (q\S+): (.*)", line)
        if m:
            result[m.group(1)] = {"status": "fail", "note": m.group(2)}
    # completeness: every oracle entry must have produced a verdict line —
    # a missing one means the checker died or a line went unparsed, and
    # must surface as a fail, never as a silently-smaller artifact
    for q in osql:
        if q not in result:
            result[q] = {"status": "fail",
                         "note": "no verdict line parsed for this query"}
    for q, why in EXCLUDE_SPARK.items():
        result[q] = {"status": "excluded", "note": why}
    counts = {}
    for v in result.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    artifact = {"x10_dir": x10, "oracle_timeout_sec": float(timeout),
                "counts": counts, "queries": dict(sorted(result.items()))}
    with open(os.path.join(REPO, "CORRECTNESS_x10.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"CORRECTNESS_x10.json written: {counts}")
    sys.exit(1 if counts.get("fail") else 0)


if __name__ == "__main__":
    main()
