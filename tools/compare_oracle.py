#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB (tables =
the sf parquet files), loads the Spark result parquet from <outDir>/<name>,
sorts columns by name and rows by all columns, and compares values
EXACTLY (stricter than any plausible driver hash).

Usage: tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols, srows = norm(sdf.fetchall(), [c for c in sdf.columns])
            odf = con.sql(sql)
            ocols, orows = norm(odf.fetchall(), [c for c in odf.columns])
            if scols != ocols:
                print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}"); n_fail += 1; continue
            if len(srows) != len(orows):
                print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"); n_fail += 1; continue
            bad = [(a, b) for a, b in zip(srows, orows) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
                n_fail += 1; continue
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
