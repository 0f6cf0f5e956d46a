#!/usr/bin/env python3
"""Bank the sf0.1 full-registry oracle sweep as CORRECTNESS_SF01.json.

Runs tools/oracle_check.py against a Verify output dir produced at
sf0.1 and converts its PASS/FAIL/SKIP lines into the same
one-object-per-query JSON shape the driver's sf0.01 artifact uses,
plus a summary block.  Usage:

    python3 tools/bank_sf01_correctness.py <sfDir> <verifyOutDir> [out.json]
"""
import json
import re
import subprocess
import sys


def main(sf_dir: str, out_dir: str, dest: str) -> int:
    proc = subprocess.run(
        [sys.executable, "tools/oracle_check.py", sf_dir, out_dir],
        capture_output=True, text=True)
    results = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"(PASS|FAIL|SKIP) (\S+) ?(.*)", line)
        if not m:
            continue
        status, name, detail = m.groups()
        name = name.rstrip(":")
        results[name] = {"status": status, "detail": detail.strip("()")}
    summary = {
        "sf": sf_dir,
        "n_pass": sum(1 for r in results.values() if r["status"] == "PASS"),
        "n_fail": sum(1 for r in results.values() if r["status"] == "FAIL"),
        "n_skip": sum(1 for r in results.values() if r["status"] == "SKIP"),
    }
    with open(dest, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
    print(json.dumps(summary))
    tail = [l for l in proc.stdout.splitlines() if l.startswith("FAIL")]
    for l in tail:
        print(l)
    return 0 if summary["n_fail"] == 0 else 1


if __name__ == "__main__":
    dest = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SF01.json"
    sys.exit(main(sys.argv[1], sys.argv[2], dest))
