#!/usr/bin/env python3
"""Summarize results/round5/*.txt into one markdown block (key lines per
artifact + OK/FAILED status) for BASELINE.md."""
import glob
import os
import re

KEY = re.compile(
    r"(speedup|ratio|nnz/s|Gnnz|GB/s|converged=|restarts=|rel err|"
    r"sigma_|cond\(A\)|amortization|pinned|wall=|retained|dot  f64|"
    r"spmv (sell|csr|dia)|SELL pack|RCM reorder|exact-vs-jacobi|"
    r"\"metric\")", re.I)
SKIP = re.compile(r"axon|WARNING|E0000|Traceback|^\s*File |^\s*\^")


def main():
    for path in sorted(glob.glob("results/round5/*.txt")):
        name = os.path.basename(path)
        text = open(path, errors="replace").read()
        status = ("OK" if "CAMPAIGN-STEP-OK" in text
                  else "FAILED" if "CAMPAIGN-STEP-FAILED" in text
                  else "incomplete")
        print(f"\n### {name} [{status}]")
        for line in text.splitlines():
            if SKIP.search(line):
                continue
            if KEY.search(line):
                print(f"    {line.strip()}")


if __name__ == "__main__":
    main()
