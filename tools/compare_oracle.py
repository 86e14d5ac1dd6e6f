#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Spark result
parquet dumped by graft.Verify (row-order-insensitive, column-name-sorted).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (fuzz gate layout)
            p = f"{p}/*.parquet"
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); n_fail += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            status = "rows-only"
            ok = len(spark_df) > 0
            print(f"{name}: {'PASS' if ok else 'FAIL'} ({status}, rows={len(spark_df)})")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        o = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} duck={list(o.columns)}")
            n_fail += 1; continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        # dtype harmony check (int32 vs int64 etc.)
        dt_mismatch = [(c, str(s[c].dtype), str(o[c].dtype))
                       for c in s.columns if str(s[c].dtype) != str(o[c].dtype)]
        if len(s) != len(o):
            print(f"{name}: ROWCOUNT spark={len(s)} duck={len(o)}"); n_fail += 1; continue
        eq = s.equals(o)
        if not eq:
            # locate first difference
            diff_cols = [c for c in s.columns if not s[c].equals(o[c])]
            print(f"{name}: VALUE MISMATCH in {diff_cols} (dtypes {dt_mismatch})")
            for c in diff_cols[:2]:
                neq = s[c] != o[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   row{i} {c}: spark={s[c][i]!r} duck={o[c][i]!r}")
            n_fail += 1
        else:
            extra = f" (dtype diff {dt_mismatch})" if dt_mismatch else ""
            print(f"{name}: PASS rows={len(s)}{extra}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
