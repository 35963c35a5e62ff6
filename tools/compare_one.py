#!/usr/bin/env python3
"""Dev aid: replay the driver's DuckDB compare for a subset of queries.

Usage: compare_one.py <sfDir> <verifyOutDir> [queryNameRegex]
Mirrors the harness convention: columns sorted by name, rows sorted,
values stringified (floats via repr of round(…, 9)) and md5-hashed.
"""
import sys, os, json, re, hashlib
import duckdb

sf, out = sys.argv[1], sys.argv[2]
pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None

oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    data = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for r in data:
        h.update("\x1f".join(r).encode() + b"\x1e")
    return len(rows), sorted(cols), h.hexdigest()

for name, sql in sorted(oracles.items()):
    if pat and not pat.search(name):
        continue
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        print(f"{name}: NO RESULT DIR")
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
    gcols = [c[0] for c in con.description]
    exp = con.execute(sql).fetchall()
    ecols = [c[0] for c in con.description]
    gn, gc, gh = canon(got, gcols)
    en, ec, eh = canon(exp, ecols)
    status = "OK" if (gn, gc, gh) == (en, ec, eh) else "MISMATCH"
    print(f"{name}: {status} rows {gn}/{en} cols {'=' if gc == ec else str(gc)+' vs '+str(ec)} hash {'=' if gh == eh else gh+' vs '+eh}")
