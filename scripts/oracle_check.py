#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB-oracle compare:
reads each Verify output parquet + oracle_sql.json, runs the SQL in DuckDB
with fixture tables registered as views, and compares schema + sorted rows.
Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
def fresh_con():
    # 2GB default deliberately mimics a starved driver connection: if the
    # full sweep passes under this on ONE long-lived connection, the
    # driver's sf0.01 sweep will too (r8/r9 post-mortem — the trained-ANN
    # CTE chains used to OOM the cumulative budget). Override via
    # GRAFT_DUCKDB_MEM for sf0.1 local runs if needed.
    c = duckdb.connect()
    c.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '2GB')}'")
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    return c

con = fresh_con()

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0

def run_with_reconnect(q):
    # cumulative allocations in one long-lived connection can starve a
    # later heavy query (seen on the 260-query sweeps), and a failed
    # reconnect must NEVER leave `con` pointing at a closed connection —
    # that cascaded every later query into "Connection has already been
    # closed" once (r7). Retry with a fresh connection, with a short
    # backoff for transient host memory pressure.
    global con
    import time
    last = None
    for attempt in range(3):
        try:
            return con.execute(q).fetchdf()
        except Exception as ex:
            last = ex
            try:
                con.close()
            except Exception:
                pass
            time.sleep(2 * attempt)
            try:
                con = fresh_con()
            except Exception:
                time.sleep(5)
                con = fresh_con()
    raise last

for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = run_with_reconnect(
            f"SELECT * FROM read_parquet('{pq}/*.parquet')")
    except Exception as ex:
        print(f"FAIL {name}: read spark output: {ex}"); fails += 1; continue
    try:
        want = run_with_reconnect(sql)
    except Exception as ex:
        print(f"FAIL {name}: oracle sql error: {ex}"); fails += 1; continue
    # driver sorts columns by name
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); fails += 1; continue
    if got.dtypes.to_dict() != want.dtypes.to_dict():
        print(f"WARN {name}: dtypes {got.dtypes.to_dict()} vs {want.dtypes.to_dict()}")
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(gs) != len(ws):
        print(f"FAIL {name}: rows {len(gs)} vs {len(ws)}"); fails += 1; continue
    eq = True
    for c in gs.columns:
        a, b = gs[c].tolist(), ws[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            # NA equality only for SAME-KIND NAs (NaT==NaT, None==None);
            # float NaN vs None is a genuine cross-engine divergence and
            # stays a mismatch (floats keep the explicit isnan path below)
            try:
                both_na = (type(x) is type(y)
                           and not isinstance(x, float)
                           and bool(__import__("pandas").isna(x))
                           and bool(__import__("pandas").isna(y)))
            except (TypeError, ValueError):
                both_na = False
            same = (x == y) or both_na or \
                (isinstance(x, float) and isinstance(y, float) and
                 (x == y or (math.isnan(x) and math.isnan(y))))
            if not same:
                print(f"FAIL {name}: col {c} row {i}: {x!r} != {y!r}")
                eq = False; break
        if not eq: break
    if eq:
        print(f"OK   {name} ({len(gs)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
