#!/usr/bin/env python3
"""Compare two Bench JSON outputs (raw {"metric":...} lines or the
driver's BENCH_r{N}.json wrapper): per-query deltas, regressions first.

Usage: python3 tools/bench_diff.py OLD NEW [--threshold 0.15]
"""
import argparse
import json
import re
import sys


def load(path):
    text = open(path).read()
    m = re.search(r'\{"metric".*', text)
    if m:
        try:
            return json.loads(m.group(0))["queries"]
        except json.JSONDecodeError:
            pass
    d = json.loads(text)
    if "queries" in d:
        return d["queries"]
    # driver wrapper: queries JSON embedded in the "tail" field
    m = re.search(r'"queries":(\{[^}]*\})', d.get("tail", ""))
    if not m:
        sys.exit(f"no queries found in {path}")
    return json.loads(m.group(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="seconds of delta worth printing")
    a = ap.parse_args()
    old, new = load(a.old), load(a.new)
    common = sorted(set(old) & set(new), key=lambda k: old[k] - new[k])
    print(f"common {len(common)}  only-old {len(set(old)-set(new))}  "
          f"only-new {len(set(new)-set(old))}")
    print(f"totals: old={sum(old.values()):.1f}s new={sum(new.values()):.1f}s "
          f"(common subset: {sum(old[k] for k in common):.1f} -> "
          f"{sum(new[k] for k in common):.1f})")
    for k in reversed(common):
        d = new[k] - old[k]
        if abs(d) >= a.threshold:
            tag = "REGRESSION" if d > 0 else "improved"
            print(f"  {k:30s} {old[k]:6.2f} -> {new[k]:6.2f}  "
                  f"({d:+.2f}) {tag}")
    for k in sorted(set(new) - set(old)):
        print(f"  {k:30s}    new -> {new[k]:6.2f}")


if __name__ == "__main__":
    main()
