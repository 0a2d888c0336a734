#!/usr/bin/env python3
"""Per-query delta table between two bench artifacts (SURVEY §6 /
round-close tooling): prints every query whose ratio new/old exceeds
the threshold, plus the suite totals. Usage:
    python3 tools/bench_delta.py OLD.json NEW.json [ratio=1.3]
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    qo, qn = old["queries"], new["queries"]
    rows = []
    for k in sorted(qn):
        if k in qo and qo[k] > 0 and qn[k] > 0:
            r = qn[k] / qo[k]
            if r >= thr or r <= 1 / thr:
                rows.append((r, k, qo[k], qn[k]))
    rows.sort(reverse=True)
    print(f"suite total: old={old['value']:.1f}s new={new['value']:.1f}s "
          f"({new['value']/old['value']:.2f}x), n={len(qn)}")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"new-only queries ({len(only_new)}): {', '.join(only_new)}")
    print(f"movers beyond {thr}x either way: {len(rows)}")
    for r, k, a, b in rows:
        print(f"  {k}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    iso = new.get("isolated", {})
    if iso:
        print("isolated (slowest suite entries):")
        for k, v in sorted(iso.items(), key=lambda kv: -kv[1]["suite"]):
            print(f"  {k}: suite {v['suite']:.2f}s isolated {v['isolated']:.2f}s")


if __name__ == "__main__":
    main()
