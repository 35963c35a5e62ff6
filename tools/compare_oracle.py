#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <verifyOutDir> <sfDir>

For each <name> subdir with a parquet dump: run oracle_sql.json[<name>]
in DuckDB over the sfDir parquet tables, sort columns by name, sort rows,
and compare row count / column names / value hash — the same contract the
driver applies for CORRECTNESS_r{N}.json.
"""
import sys, os, json, hashlib

import duckdb


def canon(rows, cols):
    import decimal
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def fmt(v):
        # Coerce fractional types through ONE formatter so a DECIMAL-
        # typed oracle expression vs a DOUBLE Spark column hashes
        # identically (Decimal('1.5') -> '1.500000', not '1.5').
        # INTEGRAL Decimals (DuckDB HUGEINT/DECIMAL(38,0) sums of
        # BIGINT) stay exact integer strings: going through float
        # would lose exactness above 2^53 and mismatch a Spark BIGINT's
        # plain '123'.
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, decimal.Decimal):
            # scale-0 type (exponent >= 0) pairs with BIGINT; any
            # fractional scale pairs with DOUBLE even if the value is
            # integral (Decimal('1.0') must hash like 1.000000)
            return (str(int(v)) if v.as_tuple().exponent >= 0
                    else f"{float(v):.6f}")
        if isinstance(v, float):
            return f"{float(v):.6f}"
        return str(v)

    out = []
    for r in rows:
        out.append(tuple(fmt(r[i]) for i in order))
    out.sort()
    return [c for c in sorted(cols)], out


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_noorc = 0
    for name in names:
        # a result dir may hold no parquet at all (Verify's last-resort
        # VERIFY_ERROR.txt sentinel when even the marker write failed) —
        # report it as a FAIL instead of crashing the whole compare
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            scols, srows = spark_rel.columns, spark_rel.fetchall()
        except Exception as e:
            sentinel = os.path.join(outdir, name, "VERIFY_ERROR.txt")
            detail = (open(sentinel).read().strip()
                      if os.path.exists(sentinel) else str(e))
            print(f"FAIL {name}: no readable result parquet: {detail}")
            n_fail += 1
            continue
        if "verify_error" in scols:
            print(f"FAIL {name}: VERIFY_ERROR marker: {srows[:1]}")
            n_fail += 1
            continue
        if name not in oracle:
            n_noorc += 1
            if not srows:
                print(f"WARN {name}: rows-only query returned 0 rows")
            continue
        try:
            orel = con.sql(oracle[name])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        ok_rows = len(sr) == len(orr)
        ok_schema = sc == oc
        ok_hash = (hashlib.md5(str(sr).encode()).hexdigest()
                   == hashlib.md5(str(orr).encode()).hexdigest())
        if ok_rows and ok_schema and ok_hash:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(sr)}/{len(orr)} schema {ok_schema} hash {ok_hash}")
            if not ok_schema:
                print(f"  spark cols: {sc}\n  oracle cols: {oc}")
            elif ok_rows:
                for a, b in zip(sr, orr):
                    if a != b:
                        print(f"  first diff:\n   spark  {a}\n   oracle {b}")
                        break
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_noorc} total={len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
