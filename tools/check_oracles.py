#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare with the Verify dump
(column names sorted, rows sorted, values hashed). Usage:
  python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['lineitem', 'orders', 'customer', 'supplier', 'nation', 'region',
          'part', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetch_df()
    except Exception as e:
        bad.append((name, f'oracle sql failed: {e}'))
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_df()
    except Exception as e:
        bad.append((name, f'spark result unreadable: {e}'))
        continue
    wcols, gcols = sorted(want.columns), sorted(got.columns)
    if wcols != gcols:
        bad.append((name, f'schema mismatch: oracle={wcols} spark={gcols}'))
        continue
    w = want[wcols].sort_values(wcols).reset_index(drop=True)
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    if len(w) != len(g):
        bad.append((name, f'row count: oracle={len(w)} spark={len(g)}'))
        continue
    mismatch = None
    for c in wcols:
        wv, gv = w[c].tolist(), g[c].tolist()
        for i, (a, b) in enumerate(zip(wv, gv)):
            eq = (a == b) or (a is None and b is None)
            try:
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b)) or a == b
            except Exception:
                pass
            if not eq and str(a) == str(b):
                eq = True
            if not eq:
                mismatch = f'col={c} row={i}: oracle={a!r} spark={b!r}'
                break
        if mismatch:
            break
    if mismatch:
        bad.append((name, mismatch))
    else:
        ok.append(name)

print(f'OK ({len(ok)}):', ' '.join(ok))
for name, why in bad:
    print(f'FAIL {name}: {why}')
sys.exit(1 if bad else 0)
