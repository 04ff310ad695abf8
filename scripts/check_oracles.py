#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles at a given SF dir and hash-compare.

Usage: python3 scripts/check_oracles.py <sfdir> <verify_out_dir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def cell(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, np.floating):
        return repr(float(v))
    return str(v)


def frame_hash(df: pd.DataFrame):
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]
    return rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not pq:
            print(f"{name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        spark_df = canon(pd.read_parquet(pq[0]))
        try:
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"{name}: ORACLE ERROR {str(e)[:300]}")
            n_fail += 1
            continue
        ok_rows = len(spark_df) == len(duck_df)
        ok_schema = list(spark_df.columns) == list(duck_df.columns)
        ok_hash = False
        if ok_rows and ok_schema:
            ok_hash = frame_hash(spark_df) == frame_hash(duck_df)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "OK":
            n_pass += 1
        else:
            n_fail += 1
            print(f"{name}: {status} rows={len(spark_df)}/{len(duck_df)} "
                  f"schema={ok_schema} hash={ok_hash}")
            if ok_rows and ok_schema and not ok_hash:
                a, b = frame_hash(spark_df), frame_hash(duck_df)
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"  first diff row {i}:\n   spark={x}\n   duck ={y}")
                        break
            elif not ok_schema:
                print(f"  spark cols={list(spark_df.columns)}")
                print(f"  duck  cols={list(duck_df.columns)}")
    print(f"passed {n_pass}, failed {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
