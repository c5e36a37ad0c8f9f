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
import decimal
import json, math, os, sys, glob, time
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def read_spark_parquet(qdir):
    """Read a Verify output dir with pyarrow DIRECTLY — never through
    DuckDB's read_parquet(...).df(), which silently coerces
    decimal128 -> float64 before canon() sees the values. That coercion
    made the r20 local gate grade q2_min_cost_supplier PASS while the
    driver (which reads the parquet through pandas/pyarrow and keeps
    decimal.Decimal) failed it on 392/394 rows. The type channel must
    stay open end-to-end."""
    files = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    if not files:
        return pd.DataFrame()
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


def arrow_type_category(t):
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_boolean(t):
        return "bool"
    return "other"


def duckdb_type_category(t):
    s = str(t).upper()
    if s.startswith("DECIMAL") or s == "HUGEINT":
        # HUGEINT lands as float64 in pandas, but as a *numeric value*
        # channel it is exact-integer-like; the driver's int/float tag
        # already covers it, so only DECIMAL is the hard category here.
        return "decimal" if s.startswith("DECIMAL") else "int"
    if s in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s == "BOOLEAN":
        return "bool"
    return "other"


def type_audit(qdir, rel):
    """Static output-type audit (r20 verdict #3): compare the Verify
    parquet's arrow column types against the oracle's DuckDB result
    types and fail on DECIMAL<->DOUBLE/int divergence — the channel the
    value hash can miss when values happen to agree. Returns a list of
    'col: spark=<cat> oracle=<cat>' strings (empty = clean)."""
    files = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    if not files:
        return []
    schema = pq.read_schema(files[0])
    spark_cats = {f.name: arrow_type_category(f.type) for f in schema}
    oracle_cats = dict(zip(rel.columns, [duckdb_type_category(t) for t in rel.types]))
    bad = []
    for col in sorted(set(spark_cats) & set(oracle_cats)):
        sc, oc = spark_cats[col], oracle_cats[col]
        # only the exactness-breaking divergences: a DECIMAL on either
        # side against a non-decimal on the other (the q2 class).
        if sc != oc and "decimal" in (sc, oc):
            bad.append(f"{col}: spark={sc} oracle={oc}")
    return bad

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
        if isinstance(v, decimal.Decimal):
            # Distinct from float ON PURPOSE (r20's red row): the driver
            # keeps Spark decimal128 parquet columns as decimal.Decimal
            # and its pandas-value hash fails them against the oracle's
            # float64 even when the numbers "look" equal. normalize()
            # strips scale-only differences (124.3576000 == 124.3576)
            # so equal decimals on both sides still match.
            return ("d", str(v.normalize()))
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
    # DECIMAL vs DOUBLE (r20 red row q2_min_cost_supplier): a Spark
    # decimal128 column read via pyarrow yields decimal.Decimal objects
    # and must NOT canon-equal the oracle's float64 of the same number
    dv = pd.DataFrame({"v": [decimal.Decimal("124.3576000")]})
    fl = pd.DataFrame({"v": [124.3576]})
    assert canon(dv)[1] != canon(fl)[1], \
        "Decimal('124.3576000') must not equal float 124.3576 (r20 q2 class)"
    # equal decimals with different scale still match (normalize strips zeros)
    dv2 = pd.DataFrame({"v": [decimal.Decimal("124.3576")]})
    assert canon(dv)[1] == canon(dv2)[1]
    # the static type audit maps arrow/duckdb types to matching categories
    assert arrow_type_category(pa.decimal128(28, 7)) == "decimal"
    assert arrow_type_category(pa.float64()) == "float"
    assert duckdb_type_category("DECIMAL(28,7)") == "decimal"
    assert duckdb_type_category("DOUBLE") == "float"
    print("selftest PASS (8 fixtures)")


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
        got = read_spark_parquet(qdir)
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
            rel = con.sql(oracle[qname])
            exp = rel.df()
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
        # static output-type audit (independent of values): DECIMAL on one
        # side vs non-decimal on the other fails even if every value agrees
        audit = type_audit(qdir, rel)
        if audit:
            hash_match = False
        err = None
        if audit:
            err = f"output-type divergence: {'; '.join(audit)}"
            print(f"  ✗ {qname}: {err}")
            n_fail += 1
        elif not schema_match:
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
