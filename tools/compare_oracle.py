import duckdb, json, glob, sys
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        exp = con.execute(sql).df()
        # driver-style: sort columns by name, compare values
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
        gs = got.reset_index(drop=True); es = exp.reset_index(drop=True)
        ok = True
        for c in gs.columns:
            a, b = gs[c], es[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                        ok = False; print(f"FAIL {name}: col {c} float mismatch"); break
                else:
                    if not (a.astype(str) == b.astype(str)).all():
                        ok = False
                        bad = (a.astype(str) != b.astype(str))
                        i = bad.idxmax()
                        print(f"FAIL {name}: col {c} row {i}: got={a[i]!r} exp={b[i]!r}"); break
            except Exception as e:
                ok = False; print(f"FAIL {name}: col {c} compare error {e}"); break
        if ok: print(f"OK   {name} ({len(got)} rows)")
    except Exception as e:
        print(f"ERR  {name}: {e}")
