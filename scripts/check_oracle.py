#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
       python3 scripts/check_oracle.py --selftest

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet, and compares: column names (sorted), row count, and
a hash over sorted rows of sorted-by-name columns.

Canonicalization is ALIGNED WITH THE DRIVER'S: columns sorted by name,
then a per-column `sort_values` pass over the whole frame, then value
hashing. The driver's sort/hash path raises on unhashable cell types
(numpy.ndarray / list / dict) — so this checker rejects them too,
loudly, BEFORE hashing. A query that emits an array-typed column will
therefore fail here exactly as it fails the driver (round 7's q71
shipped locally-green and failed the driver because the old checker
stringified cells per-value and never hit that path).
"""
import json, sys, glob, os
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _reject_unhashable(df: pd.DataFrame):
    """Mirror the driver's failure mode: its sort_values-based hashing
    throws TypeError on ndarray/list/dict cells. Detect them up front
    with an actionable message."""
    for c in df.columns:
        if df[c].dtype == object:
            head = df[c].dropna().head(1000)
            if head.map(lambda v: isinstance(v, (np.ndarray, list, dict))
                        ).any():
                raise TypeError(
                    f"unhashable cell type in column '{c}' "
                    "(ndarray/list/dict): the driver's sort_values "
                    "canonicalization rejects array-typed result columns "
                    "- emit concat_ws/array_to_string or explode to "
                    "scalar rows in BOTH engines")


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    _reject_unhashable(df)
    # Driver-style canonical order: stable per-column sort over all
    # columns (raises on incomparable cells, same as the driver).
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            ignore_index=True)
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return list(df.columns), len(rows), hash(tuple(rows)), rows


def selftest():
    """Reproduce the q71 failure mode: an array-typed column must be
    rejected by canon(), not silently stringified."""
    ok = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    cols, n, h, _ = canon(ok)
    assert cols == ["a", "b"] and n == 2, "scalar frame should canonicalize"
    bad = pd.DataFrame({"g": [1, 2],
                        "pooled": [np.array([1, 2]), np.array([3, 4])]})
    try:
        canon(bad)
    except TypeError as e:
        print(f"selftest PASS: array column rejected ({e})")
        return 0
    print("selftest FAIL: array-typed column was NOT rejected - "
          "checker is out of sync with the driver harness")
    return 1


def main(sf_dir, out_dir, only=None, start_from=None):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    if only:
        unknown = sorted(set(only) - set(oracle))
        if unknown:
            # fail loudly: a typo (or a rows-only query name) would
            # otherwise yield a vacuous "0 pass / 0 fail" green exit
            print(f"ERROR: --only names not in oracle_sql.json: {unknown}")
            return 2
        names = [n for n in names if n in only]
    if start_from:
        names = [n for n in names if n >= start_from]
        if not names:
            print(f"ERROR: --start-from '{start_from}' matches no oracle entry")
            return 2
    n_pass = n_fail = 0
    for name in names:
        sql = oracle[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
            ddf = con.execute(sql).df()
            sc, sn, sh, srows = canon(sdf)
            dc, dn, dh, drows = canon(ddf)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
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
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    # optional extras (long-gate resumability, e.g. the sf1 rehearsal):
    #   --only a,b,c      gate just those names
    #   --start-from NAME resume the sorted sweep at NAME
    only = start_from = None
    args = sys.argv[1:]
    rest = []
    i = 0
    while i < len(args):
        if args[i] == "--only":
            only = set(args[i + 1].split(",")); i += 2
        elif args[i] == "--start-from":
            start_from = args[i + 1]; i += 2
        else:
            rest.append(args[i]); i += 1
    sys.exit(main(rest[0], rest[1], only=only, start_from=start_from))
