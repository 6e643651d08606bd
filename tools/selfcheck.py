#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.
Usage: selfcheck.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# GRAFT_SKIP / GRAFT_ONLY: comma lists for big-SF sweeps where some
# oracles are quadratic in DuckDB (the driver's gate ignores these)
skip = set(filter(None, os.environ.get("GRAFT_SKIP", "").split(",")))
only = set(filter(None, os.environ.get("GRAFT_ONLY", "").split(",")))
fail = ok = 0
import time
for name, sql in sorted(oracle.items()):
    if name in skip or (only and name not in only):
        print(f"SKIP     {name}"); continue
    t0 = time.time()
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"MISSING  {name} (no spark output)"); fail += 1; continue
    try:
        spark_df = pq.read_table(pdir).to_pandas()
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}"); fail += 1; continue
    if len(s) != len(d):
        print(f"ROWS     {name}: spark={len(s)} duck={len(d)}"); fail += 1; continue
    ssort = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    dsort = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    try:
        same = all(
            (ssort[c].astype(str).values == dsort[c].astype(str).values).all()
            for c in ssort.columns)
    except Exception as e:
        print(f"CMPERR   {name}: {e}"); fail += 1; continue
    if same:
        print(f"OK       {name} ({len(s)} rows, {time.time()-t0:.0f}s)"); ok += 1
    else:
        diffs = [c for c in ssort.columns if not (ssort[c].astype(str).values == dsort[c].astype(str).values).all()]
        print(f"MISMATCH {name}: cols {diffs}")
        for c in diffs[:2]:
            m = (ssort[c].astype(str).values != dsort[c].astype(str).values)
            i = m.argmax()
            print(f"  first diff row {i} col {c}: spark={ssort[c].iloc[i]!r} duck={dsort[c].iloc[i]!r}")
        fail += 1
print(f"\n{ok} ok / {fail} fail")
sys.exit(1 if fail else 0)
