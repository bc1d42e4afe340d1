#!/usr/bin/env python3
"""Summarize RTF debug logs.

The pipeline logs one line per synthesized sentence (the benchmark
contract shared with the reference, larynx/__init__.py:266-275):

    Real-time factor: 0.01 (infer=0.12 sec, audio=9.50 sec)

This tool scrapes those lines from log files (or stdin) and prints
per-file statistics.  Usage:

    larynx-tpu --debug "..." 2>&1 | python3 scripts/analyze_benchmarks.py
    python3 scripts/analyze_benchmarks.py run1.log run2.log
"""

import re
import statistics
import sys

LINE = re.compile(
    r"Real-time factor: ([0-9.]+) \(infer=([0-9.]+) sec, audio=([0-9.]+) sec\)"
)


def summarize(name, text):
    rtfs, infer, audio = [], 0.0, 0.0
    for m in LINE.finditer(text):
        rtfs.append(float(m.group(1)))
        infer += float(m.group(2))
        audio += float(m.group(3))
    if not rtfs:
        print(f"{name}: no RTF lines found")
        return
    print(
        f"{name}: {len(rtfs)} sentence(s)  "
        f"RTF mean={statistics.mean(rtfs):.4f} "
        f"median={statistics.median(rtfs):.4f} "
        f"min={min(rtfs):.4f} max={max(rtfs):.4f}  "
        f"overall={infer / audio if audio else float('nan'):.4f} "
        f"({audio:.1f}s audio in {infer:.1f}s)"
    )


def main():
    paths = sys.argv[1:]
    if not paths:
        summarize("stdin", sys.stdin.read())
        return
    for path in paths:
        with open(path, encoding="utf-8", errors="replace") as f:
            summarize(path, f.read())


if __name__ == "__main__":
    main()
