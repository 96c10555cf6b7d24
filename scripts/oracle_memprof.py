#!/usr/bin/env python3
"""Profile DuckDB memory across the full oracle sweep on ONE long-lived
connection with the driver's starved 2GB budget — reproduces the r16
driver failure mode (cumulative allocation starving later heavy queries).
Prints per-query wall time + buffer-manager memory after the query, and
flags any query that errors. Usage: oracle_memprof.py <sfDir> <verifyOutDir>
"""
import sys, json, os, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '2GB')}'")
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.execute(f"SET threads={os.environ['GRAFT_DUCKDB_THREADS']}")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def mem_mb():
    try:
        rows = con.execute(
            "SELECT COALESCE(SUM(memory_usage_bytes),0), COALESCE(SUM(temporary_storage_bytes),0) FROM duckdb_memory()").fetchone()
        return rows[0] / 1e6, rows[1] / 1e6
    except Exception:
        return -1.0, -1.0

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
errs = 0
rows_out = []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    err = None
    try:
        con.execute(sql).fetchdf()
    except Exception as ex:
        err = str(ex).replace("\n", " ")[:160]
        errs += 1
    dt = time.time() - t0
    m, tmp = mem_mb()
    rows_out.append((name, dt, m, tmp, err))
    flag = f"  ERR {err}" if err else ""
    print(f"{name:40s} {dt:7.2f}s mem={m:8.1f}MB tmp={tmp:8.1f}MB{flag}", flush=True)
print(f"\nerrors: {errs}/{len(oracle)}")
top = sorted(rows_out, key=lambda r: -r[1])[:15]
print("slowest:")
for name, dt, m, tmp, err in top:
    print(f"  {name:40s} {dt:7.2f}s")
sys.exit(1 if errs else 0)
