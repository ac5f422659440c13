#!/usr/bin/env python3
"""r7 optimization-round self-gate: compare EVERY query's parquet dump
(new code) against the pristine pre-round worktree's dump (HEAD) —
rows-only queries included, which the oracle gate cannot check. Values
canonicalized the same way as compare_oracle.py; row order ignored."""
import sys, glob
import pandas as pd

base = sys.argv[1]
new = sys.argv[2]

names = sorted(set(
    p.split('/')[-1] for p in glob.glob(f'{base}/*') if not p.endswith('.json')))
ok, bad = [], []
for name in names:
    bf = sorted(glob.glob(f'{base}/{name}/*.parquet'))
    nf = sorted(glob.glob(f'{new}/{name}/*.parquet'))
    if not bf or not nf:
        bad.append((name, f'missing dump base={len(bf)} new={len(nf)}'))
        continue
    a = pd.concat([pd.read_parquet(f) for f in bf], ignore_index=True)
    b = pd.concat([pd.read_parquet(f) for f in nf], ignore_index=True)
    if sorted(a.columns) != sorted(b.columns):
        bad.append((name, f'schema: {sorted(a.columns)} vs {sorted(b.columns)}'))
        continue
    cols = sorted(a.columns)
    if len(a) != len(b):
        bad.append((name, f'rows: base={len(a)} new={len(b)}'))
        continue

    def canon(df):
        out = df[cols].copy()
        for c in out.columns:
            out[c] = out[c].map(
                lambda v: 'NULL' if v is None or (isinstance(v, float) and pd.isna(v))
                else (repr(round(float(v), 9)) if isinstance(v, float)
                      else str(v)))
        return out.sort_values(cols).reset_index(drop=True)
    ca, cb = canon(a), canon(b)
    if ca.equals(cb):
        ok.append(name)
    else:
        neq = (ca != cb).any(axis=1)
        bad.append((name, f'{int(neq.sum())} differing rows, first: '
                          f'{ca[neq].head(1).to_dict()} vs {cb[neq].head(1).to_dict()}'))

print(f'OK({len(ok)})')
print(f'BAD({len(bad)})')
for n, why in bad:
    print(f'  {n}: {why[:300]}')
sys.exit(1 if bad else 0)
