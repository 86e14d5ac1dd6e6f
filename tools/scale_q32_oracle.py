#!/usr/bin/env python3
"""DuckDB oracle for the 10x/100x q32 scale probe (ScaleProbe q32 mode):
quantile_cont over the generated lineitem twin vs the dumped Spark result.

Usage: scale_q32_oracle.py <probeDir>
"""
import sys
import duckdb

d = sys.argv[1]
con = duckdb.connect()
duck = con.execute(f"""
 SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
  round(quantile_cont(l_quantity, 0.25), 2) AS qty_p25
 FROM read_parquet('{d}/lineitem.parquet/*.parquet')
 GROUP BY 1 ORDER BY 1""").fetchall()
spark = con.execute(f"""
 SELECT * FROM read_parquet('{d}/q32_result.parquet/*.parquet')
 ORDER BY l_returnflag""").fetchall()
print("duck :", duck)
print("spark:", spark)
ok = duck == spark
print("MATCH" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
