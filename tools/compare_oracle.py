#!/usr/bin/env python3
"""Local stand-in for the driver's t2 oracle compare.

Reads target/verify_out/<query>/ parquet (Spark results) and runs each
oracle_sql.json entry in DuckDB over the same fixture tables, then compares
schema + values after canonical column/row sort. Driver-side tooling only —
the shipped engine is pure Scala/Spark.
"""
import duckdb, json, os, sys

out = sys.argv[1] if len(sys.argv) > 1 else '/root/repo/target/verify_out'
d = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fail = 0
for name in sorted(os.listdir(out)):
    p = f'{out}/{name}'
    if not os.path.isdir(p):
        continue
    spark_df = con.sql(f"SELECT * FROM '{p}/*.parquet'").df()
    if name not in oracle:
        print(f"{name}: rows-only, {len(spark_df)} rows")
        continue
    duck_df = con.sql(oracle[name]).df()
    cols = sorted(spark_df.columns)
    s = spark_df[cols].sort_values(by=cols).reset_index(drop=True)
    o = duck_df[sorted(duck_df.columns)].sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
    schema_match = (list(s.dtypes.astype(str)) == list(o.dtypes.astype(str))
                    and list(s.columns) == list(o.columns))
    eq = s.equals(o)
    status = 'OK' if (schema_match and eq) else 'MISMATCH'
    if status != 'OK':
        fail += 1
    print(f"{name}: rows {len(s)}/{len(o)} schema_match={schema_match} equal={eq} {status}")
sys.exit(1 if fail else 0)
