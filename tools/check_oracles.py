#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (rows/schema/hash)."""
import duckdb, json, sys, glob, os
import pandas as pd, hashlib

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
oracles = json.load(open(os.path.join(verify_dir, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.sha256(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

fails = []
for name in sorted(oracles):
    spath = glob.glob(os.path.join(verify_dir, name, "*.parquet"))
    if not spath:
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    sdf = canon(pd.concat([pd.read_parquet(p) for p in sorted(spath)]))
    odf = canon(con.execute(oracles[name]).df())
    rows = len(sdf) == len(odf)
    schema = list(sdf.columns) == list(odf.columns) and all(
        str(a) == str(b) for a, b in zip(sdf.dtypes, odf.dtypes))
    hmatch = rows and h(sdf) == h(odf)
    status = "OK" if (rows and schema and hmatch) else "FAIL"
    if status == "FAIL":
        fails.append(name)
        print(f"{name}: {status} rows={len(sdf)}/{len(odf)} schema={schema} hash={hmatch}")
        if not schema:
            print("  spark:", list(zip(sdf.columns, map(str, sdf.dtypes))))
            print("  oracle:", list(zip(odf.columns, map(str, odf.dtypes))))
    else:
        print(f"{name}: OK rows={len(sdf)}")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
