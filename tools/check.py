#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff exactly (columns sorted by name, rows
sorted, exact cell compare). Usage: python3 tools/check.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        ours = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    ours = ours.reindex(sorted(ours.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(ours.columns) != list(ref.columns):
        print(f"FAIL {name}: cols {list(ours.columns)} vs {list(ref.columns)}"); fail += 1; continue
    if len(ours) != len(ref):
        print(f"FAIL {name}: rows {len(ours)} vs {len(ref)}"); fail += 1; continue
    o = ours.sort_values(list(ours.columns)).reset_index(drop=True)
    r = ref.sort_values(list(ref.columns)).reset_index(drop=True)
    dtw = [f"{c}:{o[c].dtype}vs{r[c].dtype}" for c in o.columns
           if o[c].dtype.kind != r[c].dtype.kind]
    try:
        pd.testing.assert_frame_equal(o, r, check_dtype=False, check_exact=True)
        warn = f"  DTYPE-WARN {dtw}" if dtw else ""
        print(f"ok   {name} ({len(ours)} rows){warn}"); ok += 1
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
        diff = (o != r) & ~(o.isna() & r.isna())
        bad = diff.any(axis=1)
        print(pd.concat([o[bad].head(3).add_suffix('_ours'),
                         r[bad].head(3).add_suffix('_ref')], axis=1).to_string())
        fail += 1

# queries with no oracle get a rows-only sanity note
for pq in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(pq.rstrip("/"))
    if name not in oracle:
        n = con.sql(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
        print(f"note {name}: no oracle, {n} rows")

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
