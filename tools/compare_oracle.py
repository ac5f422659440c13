#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracleSql
entry in DuckDB against the sf parquet tables and compare with the parquet
the Spark side wrote via graft.Verify. Columns sorted by name; rows sorted
by all columns; values compared exactly (floats via repr after rounding
happened SQL-side)."""
import sys, json, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/gv1'

con = duckdb.connect()
for t in ['documents', 'lineitem', 'orders', 'customer', 'supplier', 'part',
          'nation', 'region', 'events', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f'duckdb error: {str(e)[:160]}'))
        continue
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        bad.append((name, 'no spark output'))
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if sorted(ddf.columns) != sorted(sdf.columns):
        bad.append((name, f'schema: duck={sorted(ddf.columns)} spark={sorted(sdf.columns)}'))
        continue
    cols = sorted(ddf.columns)
    a = ddf[cols].copy()
    b = sdf[cols].copy()
    if len(a) != len(b):
        bad.append((name, f'rows: duck={len(a)} spark={len(b)}'))
        continue
    def canon(df):
        out = df.copy()
        for c in out.columns:
            out[c] = out[c].map(lambda v: 'NULL' if v is None or (isinstance(v, float) and pd.isna(v))
                                else (repr(round(float(v), 9)) if isinstance(v, float)
                                else (str(int(v)) if isinstance(v, bool) else str(v))))
        return out.sort_values(cols).reset_index(drop=True)
    ca, cb = canon(a), canon(b)
    if ca.equals(cb):
        ok.append(name)
    else:
        neq = (ca != cb).any(axis=1)
        idx = list(ca.index[neq])[:3]
        detail = []
        for i in idx:
            for c in cols:
                if ca.at[i, c] != cb.at[i, c]:
                    detail.append(f'row{i} {c}: duck={ca.at[i, c]!r} spark={cb.at[i, c]!r}')
        bad.append((name, f'{neq.sum()} differing rows; ' + ' | '.join(detail[:4])))

print(f'OK  ({len(ok)}): {" ".join(ok)}')
print(f'BAD ({len(bad)}):')
for name, why in bad:
    print(f'  {name}: {why}')
