#!/usr/bin/env python3
"""Per-query bench regression gate: compare a fresh BENCH_DETAIL.json
against the committed reference (docs/BENCH_REF.json) and flag drifts.

Usage: python3 tools/bench_drift.py [BENCH_DETAIL.json [docs/BENCH_REF.json]]

A query drifts if it is slower than max(ratio * ref, ref + floor_sec) —
the floor keeps sub-second queries (dominated by fixed job latency and
host noise on this intermittently-frozen microVM) from tripping the
gate. New queries (no reference entry) are listed informationally.
Exit 1 on any drift, so this can gate a commit.
"""
import json
import sys

RATIO = 2.0
FLOOR_SEC = 1.0


def main():
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "docs/BENCH_REF.json"
    cur_j = json.load(open(detail_path))
    ref_j = json.load(open(ref_path))
    # Like-for-like: when BOTH files carry the contention-free serial
    # sidecar, compare that (a serial drift is a plan regression, not
    # pool-scheduling noise); otherwise fall back to the concurrent map.
    mode = ("serial" if "serial_queries" in cur_j and "serial_queries" in ref_j
            else "concurrent")
    key = "serial_queries" if mode == "serial" else "queries"
    cur, ref = cur_j[key], ref_j[key]
    print(f"mode={mode}")

    drifted, improved, new = [], [], []
    for name, t in sorted(cur.items()):
        if t < 0:
            drifted.append((name, t, ref.get(name, -1.0), "FAILED"))
            continue
        if name not in ref:
            new.append((name, t))
            continue
        r = ref[name]
        if t > max(RATIO * r, r + FLOOR_SEC):
            drifted.append((name, t, r, f"{t / r:.1f}x" if r > 0 else "inf"))
        elif r > max(RATIO * t, t + FLOOR_SEC):
            improved.append((name, t, r))

    for name, t in new:
        print(f"  ~ {name}: {t:.2f}s (new — no reference entry)")
    for name, t, r in improved:
        print(f"  + {name}: {t:.2f}s vs ref {r:.2f}s (improved — consider re-baselining)")
    for name, t, r, tag in drifted:
        print(f"  ✗ {name}: {t:.2f}s vs ref {r:.2f}s ({tag})")
    gone = sorted(set(ref) - set(cur))
    for name in gone:
        print(f"  ? {name}: in reference but not in this run")

    print(f"DRIFT {len(drifted)} NEW {len(new)} IMPROVED {len(improved)}")
    sys.exit(1 if drifted else 0)


if __name__ == "__main__":
    main()
