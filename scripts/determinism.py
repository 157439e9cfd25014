#!/usr/bin/env python3
"""Determinism audit: compare two Verify output dirs query by query.

Usage: python3 scripts/determinism.py <outDirA> <outDirB>

For each query directory present in A: load both sides' parquet with
DuckDB, sort columns by name and rows by all columns, hash the full
typed contents, and compare. Mirrors the driver's hash discipline, so
"identical" here means "would hash-match on any drive".
"""
import duckdb, glob, hashlib, json, os, sys


def table_hash(con, files):
    rel = con.sql(
        f"SELECT * FROM read_parquet({files!r})")
    cols = sorted(rel.columns)
    order = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(
        f'SELECT {order} FROM read_parquet({files!r}) ORDER BY {order}'
    ).fetchall()
    h = hashlib.sha256()
    for r in rows:
        h.update(repr([str(type(v)) + ":" + str(v) for v in r]).encode())
    return len(rows), h.hexdigest()


def main(a, b):
    con = duckdb.connect()
    names = sorted(os.path.basename(p) for p in glob.glob(f"{a}/*")
                   if os.path.isdir(p))
    same = diff = missing = 0
    for name in names:
        fa = sorted(glob.glob(f"{a}/{name}/*.parquet"))
        fb = sorted(glob.glob(f"{b}/{name}/*.parquet"))
        if not fa or not fb:
            print(f"MISSING {name}: a={len(fa)} files b={len(fb)} files")
            missing += 1
            continue
        try:
            na, ha = table_hash(con, fa)
            nb, hb = table_hash(con, fb)
        except Exception as e:
            print(f"ERROR {name}: {e}")
            missing += 1
            continue
        if (na, ha) == (nb, hb):
            same += 1
        else:
            print(f"NONDETERMINISTIC {name}: rows {na} vs {nb}, "
                  f"hash {ha[:12]} vs {hb[:12]}")
            diff += 1
    print(f"== {same} identical, {diff} nondeterministic, {missing} missing ==")
    return 1 if (diff or missing) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
