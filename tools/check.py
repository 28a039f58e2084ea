#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
parquet tables in <sfdir>, loads the Spark result from <outdir>/<name>/,
sorts columns by name and rows by all columns, and compares cell-by-cell
TWICE: once float-tolerant (1e-9 relative — catches value bugs), and once
on a STRICT canonical rendering that mirrors the driver's hash (integers
must render as integers — catches oracle type drift like DuckDB's
sum(BIGINT) -> HUGEINT rendering 322.0 where Spark emits 322, which the
tolerant compare is blind to). Either failing fails the query.
Usage: check.py <sfdir> <outdir> [name...]
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

def canon(v):
    """Strict canonical rendering, mirroring the driver's value hash: an
    integer-typed cell must render as an integer. A float cell stays a
    float rendering even when integral (1.0 -> '1.0'), so a HUGEINT or
    DECIMAL sum that pandas surfaces as float64 renders differently from
    Spark's BIGINT and the strict pass flags the oracle's type drift."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return str(v)

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
            continue
        # Strict pass: driver-equivalent canonical rendering must match
        # exactly. The tolerant pass above already aligned rows, so any
        # difference here is a rendering/type divergence, not a value one.
        strict_bad = None
        for i, (ro, rs) in enumerate(zip(o, s)):
            co, cs = [canon(x) for x in ro], [canon(x) for x in rs]
            if co != cs:
                strict_bad = (i, co, cs)
                break
        if strict_bad:
            print(f"FAIL {name}: STRICT row {strict_bad[0]} "
                  f"oracle={strict_bad[1]} spark={strict_bad[2]} "
                  f"(values within tolerance but canonical renderings differ "
                  f"- likely oracle type drift, e.g. missing CAST)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
