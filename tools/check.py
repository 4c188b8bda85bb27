#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Assumes `sbt 'runMain graft.Verify <sfDir> <outDir>'` already produced
<outDir>/<name>/ parquet dirs and <outDir>/oracle_sql.json. Runs each oracle
SQL in DuckDB over views named after the tables, then compares:
 - schema (column names, sorted)
 - row count
 - values: columns sorted by name, rows sorted, exact equality
Reports per-query PASS/FAIL with a diff sample.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}");  n_fail += 1;  continue
        spark = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        sc, oc = sorted(spark.columns), sorted(oracle.columns)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}");  n_fail += 1;  continue
        if len(spark) != len(oracle):
            print(f"FAIL {name}: rows spark={len(spark)} oracle={len(oracle)}");  n_fail += 1;  continue
        s = spark[sc].sort_values(sc).reset_index(drop=True)
        o = oracle[oc].sort_values(oc).reset_index(drop=True)
        # dtype check (approximate: pandas dtype equality)
        dtype_diff = [(c, str(s[c].dtype), str(o[c].dtype)) for c in sc
                      if str(s[c].dtype) != str(o[c].dtype)]
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            ok = True
        except AssertionError as e:
            ok = False
            msg = str(e).split("\n")[0]
        if ok:
            note = f" [dtype diff: {dtype_diff}]" if dtype_diff else ""
            print(f"PASS {name} ({len(spark)} rows){note}");  n_pass += 1
        else:
            print(f"FAIL {name}: value mismatch: {msg}")
            merged = s.compare(o) if s.shape == o.shape else None
            if merged is not None and len(merged):
                print(merged.head(5))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
