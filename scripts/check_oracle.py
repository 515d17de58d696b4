#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet, and compares: column names (sorted), row count, and
a hash over sorted rows of sorted-by-name columns.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing: ints as int64, floats as float64
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return list(df.columns), len(rows), hash(tuple(rows)), rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, sn, sh, srows = canon(sdf)
        dc, dn, dh, drows = canon(ddf)
        if sc != dc:
            print(f"FAIL {name}: cols spark={sc} duck={dc}"); n_fail += 1
        elif sn != dn:
            print(f"FAIL {name}: rows spark={sn} duck={dn}"); n_fail += 1
        elif sh != dh:
            n_fail += 1
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs: {diff}")
        else:
            print(f"PASS {name} ({sn} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
