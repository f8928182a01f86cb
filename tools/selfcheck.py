#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same sf tables,
sorts columns by name, normalizes values, and hash-compares.
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # round-trip through repr with a small epsilon guard
        return f"{v:.6f}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update(("|".join(normalize(row[i]) for i in order) + "\n").encode())
    return h.hexdigest()

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
        t = pq.read_table(files[0])
        spark_cols = t.column_names
        spark_rows = [tuple(r[c] for c in spark_cols) for r in t.to_pylist()]
        try:
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"ORAERR   {name}: {e}"); n_fail += 1; continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"SCHEMA   {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1; continue
        if len(spark_rows) != len(duck_rows):
            print(f"ROWS     {name}: spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1; continue
        hs = table_hash(spark_cols, spark_rows)
        hd = table_hash(duck_cols, duck_rows)
        if hs != hd:
            print(f"HASH     {name}: mismatch ({len(spark_rows)} rows)")
            # show first differing row for debugging
            order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
            order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            for i, (rs, rd) in enumerate(zip(spark_rows, duck_rows)):
                vs = [normalize(rs[j]) for j in order_s]
                vd = [normalize(rd[j]) for j in order_d]
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
