#!/usr/bin/env python3
"""Derive bench_floors/<sf>.json from a clean full-precision bench record.

Usage: python3 tools/make_floors.py target/bench.json bench_floors/sf0.1.json

The floor for each query is its clean min-of-runs time. Bench treats a
query whose official min exceeds 2x its floor as suspect: it re-runs the
query (bounded) and, if the inflation persists, classifies it as
contended (adjacent canary dirty) or a genuine regression (canaries
clean) — so floors should come from an idle-machine run, verified by the
record's own canary trace (canary_sec inside the expected band, empty
contended_queries).
"""
import json
import sys


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        rec = json.load(f)
    if rec.get("contended"):
        print(f"refusing: {src} is marked contended", file=sys.stderr)
        return 1
    floors = {q: round(t, 3) for q, t in sorted(rec["queries"].items()) if t > 0}
    with open(dst, "w") as f:
        json.dump(floors, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(floors)} floors to {dst} "
          f"(canary {rec.get('canary_sec')}s, sf {rec.get('sf')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
