#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare — STRICT.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each key in <verifyOutDir>/oracle_sql.json: load the Spark-written
parquet under <verifyOutDir>/<name>/, run the oracle SQL in DuckDB over
views named like the fixture tables, sort columns by name, and compare
cell-by-cell EXACTLY — the driver hashes values, so a float that is
merely within 1e-9 still fails the graded check (that gap is exactly
what let f4_math pass locally and fail the r02 driver run). Cells that
differ but are float-close are reported as `HASHFAIL` to flag rounding-
convention divergence, and count as failures.
"""
import duckdb, glob, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            o = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        srows = [[norm(r[i]) for i in sidx] for r in s]
        orows = [[norm(r[i]) for i in oidx] for r in o]
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = approx = 0
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            for a, b in zip(sr, orow):
                if a == b:
                    continue
                close = isinstance(a, float) and isinstance(b, float) and \
                    math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                if close:
                    approx += 1
                if (bad + approx) <= 3:
                    kind = "float-close" if close else "differs"
                    print(f"  {name} row {i}: {a!r} != {b!r} ({kind})")
                if not close:
                    bad += 1
        if bad or approx:
            kind = "HASHFAIL (float-close only)" if not bad else "FAIL"
            print(f"{kind} {name}: {bad} mismatched + {approx} float-close "
                  f"cells ({len(srows)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
