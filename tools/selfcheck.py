#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate:
run graft.Verify output vs SparkEntry.oracleSql in DuckDB.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

(Dev tooling only — the shipped library is pure Scala/Spark.)
"""
import duckdb, json, math, sys, glob, os

def norm(v):
    # EXACT value compare, mirroring the driver's hash-based gate. Round 1
    # taught us the hard way: normalizing Decimal->float here made selfcheck
    # report 27/27 while the driver failed every DECIMAL-output query.
    # Lists become tuples only so rows are hashable/comparable.
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = [tuple(norm(r[want.columns.index(c)]) for c in want_cols)
                         for r in want.fetchall()]
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [tuple(norm(r[got.columns.index(c)]) for c in got_cols)
                        for r in got.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if want_cols != got_cols:
            print(f"FAIL {name}: cols want={want_cols} got={got_cols}"); n_fail += 1
        elif want_rows != got_rows:
            print(f"FAIL {name}: rows want={len(want_rows)} got={len(got_rows)}")
            for i, (w, g) in enumerate(zip(want_rows, got_rows)):
                if w != g:
                    print(f"  first diff at row {i}:\n   want={w}\n   got ={g}")
                    break
            else:
                if len(want_rows) != len(got_rows):
                    w = want_rows[len(got_rows):len(got_rows)+1]
                    g = got_rows[len(want_rows):len(want_rows)+1]
                    print(f"  extra: want={w} got={g}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
