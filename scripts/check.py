#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each key in <verifyOutDir>/oracle_sql.json: load the Spark-written
parquet under <verifyOutDir>/<name>/, run the oracle SQL in DuckDB over
views named like the fixture tables, sort columns by name, and compare
cell-by-cell (exact for non-floats, exact-or-1e-9 for floats, reporting
which). This is a development aid only — the graded compare is the
driver's own.
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
                if isinstance(a, float) and isinstance(b, float) and \
                        math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
                    approx += 1
                    continue
                if bad < 3:
                    print(f"  {name} row {i}: {a!r} != {b!r}")
                bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells ({len(srows)} rows)")
            n_fail += 1
        else:
            note = f" [{approx} float-approx]" if approx else ""
            print(f"PASS {name}: {len(srows)} rows{note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
