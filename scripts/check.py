#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare — STRICT + TYPED.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each key in <verifyOutDir>/oracle_sql.json: load the Spark-written
parquet under <verifyOutDir>/<name>/, run the oracle SQL in DuckDB over
views named like the fixture tables, sort columns by name, and compare
EXACTLY — values AND types. The driver hashes TYPED values, so:

  - a float that is merely within 1e-9 still fails (r02: f4_math);
  - a value-equal cell with a different type still fails (r03: Spark
    floor() -> BIGINT vs DuckDB floor() -> DOUBLE, DuckDB sum(BIGINT)
    -> HUGEINT vs Spark BIGINT, DECIMAL physical-repr divergence).
    Python `==` coerces 25 == 25.0 == Decimal('25'), which is exactly
    how d1/f4/u4 passed here while failing the driver three rounds
    running — so this checker compares DuckDB column TYPES (oracle
    relation vs spark-parquet relation) and per-cell Python types.

DECIMAL and HUGEINT output columns are additionally flagged as
hash-hazards even when both sides agree: their physical representation
differs between engines/readers, so oracle-checked queries should emit
BIGINT or DOUBLE instead.
"""
import duckdb, glob, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HAZARD_TYPES = ("DECIMAL", "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
                "UBIGINT")

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
    n_pass = n_fail = n_hazard = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            orel = con.sql(sql)
            ocols = list(orel.columns)
            otypes = [str(t) for t in orel.types]
            o = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        srel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols = list(srel.columns)
        stypes = [str(t) for t in srel.types]
        s = srel.fetchall()
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        # column-TYPE parity: the driver's hash is over typed values, so a
        # BIGINT column on one side and DOUBLE on the other fails even when
        # every value compares == in Python.
        smap = dict(zip(scols, stypes))
        omap = dict(zip(ocols, otypes))
        tmis = [(c, smap[c], omap[c]) for c in sorted(omap) if smap[c] != omap[c]]
        if tmis:
            for c, st, ot in tmis[:4]:
                print(f"  {name} col {c}: spark type {st} != oracle type {ot}")
            print(f"FAIL {name}: {len(tmis)} column type mismatches")
            n_fail += 1
            continue
        hazards = [(c, smap[c]) for c in sorted(smap)
                   if any(smap[c].startswith(h) for h in HAZARD_TYPES)]
        if hazards:
            print(f"HAZARD {name}: engine-divergent output types {hazards} "
                  f"(emit BIGINT/DOUBLE instead)")
            n_hazard += 1
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        sraw = [[r[i] for i in sidx] for r in s]
        oraw = [[r[i] for i in oidx] for r in o]
        if len(sraw) != len(oraw):
            print(f"FAIL {name}: rows spark={len(sraw)} oracle={len(oraw)}")
            n_fail += 1
            continue
        bad = approx = typebad = 0
        for i in range(len(sraw)):
            for a, b in zip(sraw[i], oraw[i]):
                if type(a) is not type(b):
                    typebad += 1
                    if (bad + approx + typebad) <= 3:
                        print(f"  {name} row {i}: type {type(a).__name__}({a!r}) "
                              f"!= {type(b).__name__}({b!r})")
                    continue
                a2, b2 = norm(a), norm(b)
                if a2 == b2:
                    continue
                close = isinstance(a2, float) and isinstance(b2, float) and \
                    math.isclose(a2, b2, rel_tol=1e-9, abs_tol=1e-9)
                if close:
                    approx += 1
                if (bad + approx + typebad) <= 3:
                    kind = "float-close" if close else "differs"
                    print(f"  {name} row {i}: {a2!r} != {b2!r} ({kind})")
                if not close:
                    bad += 1
        if bad or approx or typebad:
            print(f"FAIL {name}: {bad} mismatched + {approx} float-close + "
                  f"{typebad} type-mismatched cells ({len(sraw)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sraw)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_hazard} hazard ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
