#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfdir> <outdir>
Reads <outdir>/<name>/ parquet (Spark results) + <outdir>/oracle_sql.json,
runs each oracle in DuckDB with views over <sfdir>/*.parquet, and compares
schema/rows/values (columns sorted by name, rows sorted by all columns).

Dev tooling only — NOT part of the graft library.
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet files"); n_fail += 1; continue
        try:
            odf = con.sql(sql).fetchall()
            ocols = [d[0] for d in con.sql(sql).description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        otypes = [str(t) for t in con.sql(sql).types]
        sdf_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in sdf_rel.description]
        stypes = [str(t) for t in sdf_rel.types]
        sdf = sdf_rel.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}"); n_fail += 1; continue
        # TYPE gate: the driver's hash is sensitive to types that change the
        # VALUE representation (DuckDB sum(BIGINT) → HUGEINT lands as
        # float64 in pandas, so 42 hashes as 42.0 — the r5 regression
        # class), but tolerant of integer WIDTH (INTEGER vs BIGINT both
        # hash as plain ints — 18 such drifts passed the r5 driver).
        # Compare per-column type CLASSES; HUGEINT/DECIMAL never match.
        def tclass(t):
            if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
                return "exact128"        # repr-changing: always a drift vs Spark output
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t
        tmap_o = dict(zip(ocols, otypes))
        tmap_s = dict(zip(scols, stypes))
        def drift(c):
            st, ot = tmap_s[c], tmap_o[c]
            # Spark never writes int128: an oracle HUGEINT always degrades
            # to float64 in the driver's pandas hash, even if the Python
            # row compare here would pass (Decimal(42) == 42)
            if ot in ("HUGEINT", "UHUGEINT") or st in ("HUGEINT", "UHUGEINT"):
                return True
            # DECIMALs must match EXACTLY: a scale drift (or DECIMAL vs
            # HUGEINT) changes the value repr the driver hashes
            if tclass(st) == "exact128" or tclass(ot) == "exact128":
                return st != ot
            return tclass(st) != tclass(ot)
        tbad = [(c, tmap_s[c], tmap_o[c]) for c in sorted(ocols) if drift(c)]
        if tbad:
            print(f"FAIL {name}: column TYPE drift (col, spark, oracle): {tbad}"); n_fail += 1; continue
        # reorder columns by sorted name, then sort rows
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        srows = sorted([tuple(norm(r[i]) for i in sidx) for r in sdf], key=repr)
        orows = sorted([tuple(norm(r[i]) for i in oidx) for r in odf], key=repr)
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"); n_fail += 1; continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row mismatches; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
