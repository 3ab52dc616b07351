#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate:
run graft.Verify output vs SparkEntry.oracleSql in DuckDB.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

(Dev tooling only — the shipped library is pure Scala/Spark.)

Mirrors the driver harness through pandas, because the driver is
dtype-sensitive where plain Python `==` is not. Round-4 lessons baked in:
  - DuckDB window/agg sum(BIGINT) -> HUGEINT -> pandas float64, while Spark
    emits int64. Values compare equal under `==` (1.0 == 1) but the driver's
    hash differs -> FAIL. So we compare pandas dtypes, not just values.
  - List-typed output columns crash the driver's sort_values
    ("unhashable type: numpy.ndarray") -> the query records as err. So we
    reject any list/array-typed column outright.
Round-1 lesson retained: no value normalization (Decimal->float here once
made selfcheck green while the driver failed every DECIMAL query).
"""
import duckdb, json, sys, os
import numpy as np

def list_cols(df):
    out = []
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            out.append(c)
    return out

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
            want = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        bad = sorted(set(list_cols(want)) | set(list_cols(got)))
        if bad:
            # the driver's pandas sort crashes on these -> recorded as err
            print(f"FAIL {name}: list-typed column(s) {bad} — emit "
                  f"md5(array_to_string(...)) or explode instead")
            n_fail += 1; continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} "
                  f"got={list(got.columns)}"); n_fail += 1; continue
        wt, gt = [str(t) for t in want.dtypes], [str(t) for t in got.dtypes]
        if wt != gt:
            diffs = [f"{c}: oracle={a} spark={b}"
                     for c, a, b in zip(want.columns, wt, gt) if a != b]
            print(f"FAIL {name}: dtype mismatch ({'; '.join(diffs)}) — the "
                  f"driver hashes dtype-sensitively (1.0 != 1)")
            n_fail += 1; continue
        try:
            cols = list(want.columns)
            want = want.sort_values(cols, kind="mergesort").reset_index(drop=True)
            got = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: driver-style sort crashed: {e}")
            n_fail += 1; continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
        elif not want.equals(got):
            neq = (want != got) & ~(want.isna() & got.isna())
            idx = neq.any(axis=1)
            i = int(idx[idx].index[0]) if idx.any() else 0
            print(f"FAIL {name}: values differ; first diff at sorted row {i}:"
                  f"\n   want={tuple(want.iloc[i])}\n   got ={tuple(got.iloc[i])}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
