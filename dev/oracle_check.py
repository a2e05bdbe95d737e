import duckdb, json, glob, os, sys, math
sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
def norm(df):
    # driver-style: sort columns by name, then rows (arrays stringified
    # first so pandas can sort them)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     type(v).__name__ == 'ndarray').any():
            df[c] = df[c].map(canon)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return 'nan'
        return f'{v:.10g}'
    if isinstance(v, list): return '[' + ','.join(canon(x) for x in v) + ']'
    try:
        import numpy as np
        if isinstance(v, np.ndarray): return '[' + ','.join(canon(x) for x in v.tolist()) + ']'
    except Exception: pass
    return str(v)
fails = 0
for name in sorted(oracles):
    try:
        got = duckdb.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        exp = con.sql(oracles[name]).df()
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f'FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}'); fails += 1; continue
        if len(g) != len(e):
            print(f'FAIL {name}: rows {len(g)} vs {len(e)}'); fails += 1; continue
        gh = [tuple(canon(v) for v in row) for row in g.itertuples(index=False)]
        eh = [tuple(canon(v) for v in row) for row in e.itertuples(index=False)]
        if gh != eh:
            bad = next(i for i in range(len(gh)) if gh[i] != eh[i])
            print(f'FAIL {name}: first diff row {bad}: got {gh[bad]} exp {eh[bad]}'); fails += 1; continue
        print(f'OK   {name} ({len(g)} rows)')
    except Exception as ex:
        print(f'ERR  {name}: {str(ex)[:200]}'); fails += 1
rows_only = [os.path.basename(d) for d in glob.glob(f'{outdir}/q*') if os.path.basename(d) not in oracles]
for name in sorted(rows_only):
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')").fetchone()[0]
    print(f'{"ROWS" if n > 0 else "FAIL"} {name} ({n} rows)')
    if n == 0: fails += 1
sys.exit(1 if fails else 0)
