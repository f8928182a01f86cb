#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same sf tables,
sorts columns by name, normalizes values, and hash-compares.

Both sides deliberately go through PANDAS — spark via pyarrow.to_pandas(),
DuckDB via cursor.df() — because that is the driver's path. It is lossy in
ways fetchall() is not, and those losses are exactly the bug class this tool
must catch locally: DuckDB HUGEINT (e.g. sum(BIGINT)) becomes float64
("99111.000000" vs spark's "99111"), and array columns become numpy.ndarray,
which crashes the driver's row sort_values ("unhashable type"). Round 2
shipped q20/q32/q38 locally-green for precisely this reason.
"""
import sys, json, glob, os, hashlib
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

def normalize(v):
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, float):
        # round-trip through repr with a small epsilon guard
        return f"{v:.6f}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update(("|".join(normalize(row[i]) for i in order) + "\n").encode())
    return h.hexdigest()

def sorted_rows(df):
    """Driver-style: project to name-sorted columns, sort rows by all of
    them (raises on unsortable cell types — that's the point), return
    tuples."""
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    return cols, [tuple(r) for r in df.itertuples(index=False, name=None)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result"); n_fail += 1; continue
        try:
            spark_cols, spark_rows = sorted_rows(pq.read_table(files[0]).to_pandas())
        except Exception as e:
            print(f"SPARKERR {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        try:
            duck_cols, duck_rows = sorted_rows(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"ORAERR   {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if spark_cols != duck_cols:
            print(f"SCHEMA   {name}: spark={spark_cols} duck={duck_cols}")
            n_fail += 1; continue
        if len(spark_rows) != len(duck_rows):
            print(f"ROWS     {name}: spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1; continue
        hs = table_hash(spark_cols, spark_rows)
        hd = table_hash(duck_cols, duck_rows)
        if hs != hd:
            print(f"HASH     {name}: mismatch ({len(spark_rows)} rows)")
            # show first differing row for debugging (columns already sorted)
            for i, (rs, rd) in enumerate(zip(spark_rows, duck_rows)):
                vs = [normalize(v) for v in rs]
                vd = [normalize(v) for v in rd]
                if vs != vd:
                    print(f"  row {i}: spark={vs}\n  row {i}:  duck={vd}")
                    break
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(spark_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
