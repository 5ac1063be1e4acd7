#!/usr/bin/env python3
"""Oracle-vs-Spark column TYPE gate.

For every oracled query: run the oracle SQL with LIMIT 0 in DuckDB to
get its output column types, read the Spark result parquet's types the
same way (both through DuckDB so the type vocabulary is shared), and
report any divergence. The driver's hash canonicalizes some widths
(int32/int64) but not others (HUGEINT -> decimal128) -- exact types on
both sides is the only contract that cannot drift.

Usage: tools/type_gate.py /root/testdata/sf0.01 /tmp/verify_out
Exit 1 on any divergence.
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


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
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r}) LIMIT 0")
            stypes = dict(zip(sdf.columns, [str(t) for t in sdf.types]))
            odf = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            otypes = dict(zip(odf.columns, [str(t) for t in odf.types]))
            if set(stypes) != set(otypes):
                print(f"FAIL {name}: column sets differ spark={sorted(stypes)} oracle={sorted(otypes)}")
                n_fail += 1; continue
            diff = {c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes[c]}
            if diff:
                print(f"FAIL {name}: " + ", ".join(
                    f"{c}: spark={a} oracle={b}" for c, (a, b) in sorted(diff.items())))
                n_fail += 1; continue
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"\ntype_gate: {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
