#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify output
against DuckDB oracle SQL on the same parquet fixtures and compare
row-by-row (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [summaryJson]

With a third argument, also writes a machine-readable per-query summary
in the driver's CORRECTNESS_r{N}.json schema:
  {"<query>": {"rows_match": bool, "schema_match": bool,
               "hash_match": bool, "err": str|null}, ...}
so the repo carries committable correctness evidence even when the
driver's own artifact fails to land (round 13 closed with
CORRECTNESS_r13.json == {}).
"""
import json, math, os, sys, glob, time
import duckdb
import numpy as np

def canon(df):
    # columns sorted by name; rows sorted by all columns; floats rounded.
    # Values are TYPE-TAGGED: the driver's gate hashes pandas values, where
    # int64 5710 != float64 5710.0 (e.g. DuckDB HUGEINT -> pandas float64).
    # Python `==` would hide that class of mismatch, so tag int vs float.
    cols = sorted(df.columns)
    df = df[cols]
    recs = df.values.tolist()
    def norm(v):
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return ("b", bool(v))
        if isinstance(v, float) or isinstance(v, np.floating):
            f = float(v)
            if f != f:  # NaN (e.g. pandas null) -> stable sentinel
                return ("f", None)
            # Tag the SIGN of zero: the driver's pandas-value hash
            # distinguishes -0.0 from 0.0, but Python == does not
            # (r19's one red row, ann_planner_cosine, was exactly this —
            # DuckDB round(-2e-17, 4) -> -0.0 vs Spark +0.0 — and this
            # replica graded it PASS). round() preserves the sign bit,
            # so a post-round zero still needs the copysign tag.
            r = round(f, 6)
            sign = "-" if r == 0 and math.copysign(1.0, r) < 0 else "+"
            return ("f", r, sign)
        if isinstance(v, int) or isinstance(v, np.integer):
            return ("i", int(v))
        return v
    rows = sorted([tuple(norm(v) for v in r) for r in recs], key=lambda r: str(r))
    return cols, rows

def selftest():
    """Planted regression fixtures for canon() (run: check_oracle.py --selftest).

    The r19 failure class: the driver's pandas-value hash distinguishes
    -0.0 from 0.0 but this replica's old `("f", round(f, 6))` + Python ==
    did not (-0.0 == 0.0 is True), so ann_planner_cosine shipped green
    locally and burned a driver round. canon() must keep these apart.
    """
    import pandas as pd
    neg = pd.DataFrame({"id": [0, 1], "v": [-0.0, 1.5]})
    pos = pd.DataFrame({"id": [0, 1], "v": [0.0, 1.5]})
    cn, rn = canon(neg)
    cp, rp = canon(pos)
    assert cn == cp
    assert rn != rp, "canon must distinguish -0.0 from 0.0 (r19 red row class)"
    # post-round zeros: -1e-9 rounds to -0.0 at 6 dp and must still differ
    tiny = pd.DataFrame({"id": [0], "v": [-1e-9]})
    zero = pd.DataFrame({"id": [0], "v": [0.0]})
    assert canon(tiny)[1] != canon(zero)[1], \
        "a post-round -0.0 (round(-1e-9, 6)) must not equal +0.0"
    # equal -0.0 on both sides still matches (normalizing engines agree)
    assert canon(neg)[1] == canon(neg.copy())[1]
    # int vs float tagging is preserved
    iv = pd.DataFrame({"v": np.array([5], dtype="int64")})
    fv = pd.DataFrame({"v": np.array([5.0], dtype="float64")})
    assert canon(iv)[1] != canon(fv)[1], "int64 5 must not equal float64 5.0"
    # NaN sentinel is stable
    nn = pd.DataFrame({"v": [float("nan")]})
    assert canon(nn)[1] == canon(nn.copy())[1]
    print("selftest PASS (5 fixtures)")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    summary_path = sys.argv[3] if len(sys.argv) > 3 else None
    summary = {}

    # Incremental summary (r18 verdict #1: the driver's gate died mid-run
    # and its CORRECTNESS_r18.json landed as `{}`): after EVERY query's
    # verdict the summary is rewritten atomically (write temp + rename),
    # so a harness timeout/kill at any point still leaves a valid JSON
    # carrying every query graded so far instead of nothing.
    def flush():
        if summary_path:
            tmp = summary_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(summary, f, indent=1, sort_keys=True)
            os.replace(tmp, summary_path)

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    out_dirs = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                if os.path.isdir(d)}
    # every declared query must have produced output — a query that
    # crashed inside Verify must FAIL here, not silently vanish
    for qname in sorted(set(oracle) - out_dirs):
        print(f"  ✗ {qname}: declared in oracle_sql.json but produced no output (Verify crash?)")
        summary[qname] = {"rows_match": False, "schema_match": False,
                          "hash_match": False, "err": "no Verify output"}
        n_fail += 1
        flush()
    slow = []
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        qname = os.path.basename(qdir)
        t0 = time.monotonic()
        got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        if qname not in oracle:
            if len(got) > 0:
                print(f"  ~ {qname}: rows-only check, rows={len(got)} OK")
                summary[qname] = {"rows_match": True, "schema_match": None,
                                  "hash_match": None, "err": None}
            else:
                print(f"  ✗ {qname}: rows-only check but EMPTY result")
                summary[qname] = {"rows_match": False, "schema_match": None,
                                  "hash_match": None, "err": "empty result"}
                n_fail += 1
            flush()
            continue
        try:
            exp = con.sql(oracle[qname]).df()
        except Exception as e:
            print(f"  ✗ {qname}: oracle SQL error: {e}")
            summary[qname] = {"rows_match": False, "schema_match": False,
                              "hash_match": False, "err": f"oracle SQL error: {e}"}
            n_fail += 1
            flush()
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        rows_match = len(gr) == len(er)
        schema_match = gc == ec
        hash_match = schema_match and rows_match and gr == er
        err = None
        if not schema_match:
            err = f"column mismatch spark={gc} oracle={ec}"
            print(f"  ✗ {qname}: {err}")
            n_fail += 1
        elif not rows_match:
            err = f"row count spark={len(gr)} oracle={len(er)}"
            print(f"  ✗ {qname}: {err}")
            n_fail += 1
        elif not hash_match:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            err = f"value mismatch, first diffs: {diffs}"
            print(f"  ✗ {qname}: {err}")
            n_fail += 1
        else:
            print(f"  ✓ {qname}: {len(gr)} rows match")
            n_pass += 1
        summary[qname] = {"rows_match": rows_match, "schema_match": schema_match,
                          "hash_match": hash_match, "err": err}
        flush()
        slow.append((time.monotonic() - t0, qname))
    for dt, qname in sorted(slow, reverse=True)[:5]:
        if dt >= 5.0:
            print(f"  ⏱ slow oracle: {qname} {dt:.1f}s")
    print(f"PASS {n_pass} FAIL {n_fail}")
    if summary_path:
        flush()
        print(f"wrote {summary_path} ({len(summary)} queries)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
