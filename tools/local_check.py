#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle compare.

Usage: python3 tools/local_check.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (Spark results) + outDir/oracle_sql.json,
runs each oracle in DuckDB over sfDir tables, sorts columns by name and
rows by value, and reports row/schema/value match per query.
"""
import duckdb, json, sys, glob
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        res = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}"); fails += 1; continue
    try:
        spark_df = pd.read_parquet(f'{out}/{name}')
    except Exception as e:
        print(f"{name}: SPARK RESULT MISSING: {str(e)[:120]}"); fails += 1; continue
    res = res.reindex(sorted(res.columns), axis=1)
    spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
    schema_ok = list(res.columns) == list(spark_df.columns)
    if schema_ok and len(res.columns):
        res = res.sort_values(list(res.columns)).reset_index(drop=True)
        spark_df = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
    ok, err = True, ''
    try:
        pd.testing.assert_frame_equal(res, spark_df, check_dtype=False,
                                      check_exact=False, rtol=1e-9, atol=1e-9)
    except Exception as e:
        ok, err = False, str(e)[:400]
    status = 'OK' if (ok and schema_ok) else 'FAIL'
    if status == 'FAIL': fails += 1
    print(f"{name}: {status} rows={len(spark_df)}/{len(res)} schema={schema_ok}")
    if not ok: print('   ', err.replace(chr(10), ' | ')[:300])
print(f"--- {len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
