#!/usr/bin/env python3
"""Determinism check: arrow-diff two independent Verify dump dirs.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/va"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vb"
  python3 tools/diff_dumps.py /tmp/va /tmp/vb

Nondeterminism (unordered output, unrounded doubles, RNG) silently
zeroes the driver's hash gate — this catches it pre-submit. Exit 1 on
any mismatch.
"""
import os
import sys

import pyarrow.parquet as pq


def main() -> int:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(n for n in os.listdir(a_dir) if n.startswith("q_"))
    bad = []
    for n in names:
        ta = pq.read_table(os.path.join(a_dir, n))
        tb = pq.read_table(os.path.join(b_dir, n))
        if not ta.equals(tb):
            bad.append(n)
    print(f"{len(names)} dumps compared, {len(bad)} mismatches")
    for n in bad:
        print("DIFF", n)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
