#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare:
runs each oracle_sql.json entry over the sf parquet tables and compares
row count, column names (sorted), and a value hash against the Spark dump."""
import sys, json, glob, os
import duckdb, pandas as pd
import hashlib

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # canonical text: round-trip floats through repr, timestamps to iso
    return df

def value_hash(df):
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.astype(str)
        elif str(s.dtype).startswith("datetime"):
            vals = s.astype("datetime64[us]").astype(str)
        elif s.dtype == float:
            vals = s.map(lambda v: repr(float(v)))
        else:
            vals = s.astype(str)
        h.update(("\x00".join(vals.tolist())).encode())
    return h.hexdigest()

fails = 0
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        odf = con.execute(oracle[name]).df()
        sdf, odf = canon(sdf), canon(odf)
        issues = []
        if sorted(sdf.columns) != sorted(odf.columns):
            issues.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            issues.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        else:
            for c in sdf.columns:
                if str(sdf[c].dtype) != str(odf[c].dtype):
                    issues.append(f"dtype[{c}] spark={sdf[c].dtype} oracle={odf[c].dtype}")
            if not issues and value_hash(sdf) != value_hash(odf):
                diff = (sdf != odf)
                ndiff = int(diff.any(axis=1).sum())
                first = sdf[diff.any(axis=1)].head(3)
                firsto = odf[diff.any(axis=1)].head(3)
                issues.append(f"hash mismatch ({ndiff} differing rows)\n spark:\n{first}\n oracle:\n{firsto}")
        if issues:
            fails += 1
            print(f"FAIL {name}: " + "; ".join(issues))
        else:
            print(f"ok   {name}: rows={len(sdf)}")
    except Exception as e:
        fails += 1
        print(f"ERROR {name}: {type(e).__name__}: {e}")
print("RESULT:", "FAIL" if fails else "ALL OK", f"({fails} failures)")
sys.exit(1 if fails else 0)
