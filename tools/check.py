#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
Reads each <out>/<name> parquet (Spark result) and runs <out>/oracle_sql.json
in DuckDB with views over the sf dir's parquet tables; compares after sorting
columns by name and rows by all columns. Reports value + dtype diffs strictly
(bit-exact for floats first, then tolerance diagnostics).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = [os.path.basename(d) for d in sorted(glob.glob(f"{outdir}/*")) if os.path.isdir(d)]
    n_pass = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check) rows={len(spark_df)}")
            n_pass += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); continue
        ok = True
        for c in s.columns:
            sv, dv = s[c], d[c]
            if str(sv.dtype) != str(dv.dtype):
                print(f"  WARN {name}.{c}: dtype spark={sv.dtype} duck={dv.dtype}")
            try:
                eq = (sv.astype(object) == dv.astype(object)) | (sv.isna() & dv.isna())
            except Exception:
                eq = pd.Series([False] * len(sv))
            if not eq.all():
                bad = (~eq).idxmax()
                print(f"FAIL {name}.{c}: {int((~eq).sum())}/{len(sv)} mismatches; first@{bad}: spark={sv[bad]!r} duck={dv[bad]!r}")
                ok = False
        if ok:
            print(f"PASS {name} rows={len(s)}")
            n_pass += 1
    print(f"== {n_pass}/{len(names)} pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
