#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the same
testdata parquet tables, sorts columns by name, and compares values
exactly. Not part of the shipped library (driver-side python only).
"""
import sys, os, json, math
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(out_dir, sf_dir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        got, exp = got[gc], exp[gc]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in gc:
            gv = [norm(v) for v in got[c].tolist()]
            ev = [norm(v) for v in exp[c].tolist()]
            for i, (a, b) in enumerate(zip(gv, ev)):
                # None/NaN equivalence is handled by norm() + str() fallback
                if str(a) == str(b):
                    continue
                if a != b:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duckdb={b!r} "
                  f"(types: {type(a).__name__}/{type(b).__name__})")
            n_fail += 1
        else:
            # dtype check (schema-level parity)
            gd = [str(x) for x in got.dtypes]
            ed = [str(x) for x in exp.dtypes]
            note = "" if gd == ed else f"  [dtype diff: {list(zip(gc, gd, ed))}]"
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
