#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
parquet tables in <sfdir>, loads the Spark result from <outdir>/<name>/,
sorts columns by name and rows by all columns, and compares cell-by-cell
(floats to 1e-9 relative). Usage: check.py <sfdir> <outdir> [name...]
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def eq(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, (int, float)):
        return math.isclose(float(a), b, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)

def main(sfdir, outdir, only):
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        except Exception:
            pass
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        o = odf[ocols].values.tolist()
        s = sdf[scols].values.tolist()

        def skey(x):
            # Sort floats on a rounded rendering: exact float strings would
            # let sub-tolerance fp noise order the two frames differently
            # and misalign the row-wise compare.
            v = norm(x)
            if isinstance(v, float):
                return f"{v:.6e}"
            return str(v)
        key = lambda r: tuple(skey(x) for x in r)
        o.sort(key=key); s.sort(key=key)
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        bad = None
        for i, (ro, rs) in enumerate(zip(o, s)):
            if not all(eq(a, b) for a, b in zip(ro, rs)):
                bad = (i, ro, rs)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} oracle={bad[1]} spark={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
