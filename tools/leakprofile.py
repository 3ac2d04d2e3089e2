#!/usr/bin/env python3
"""Rank oracle SQLs by the DuckDB 1.0 process-global reservation leak:
each query runs repeatedly on one capped connection in its own
subprocess; iterations-to-OOM ~ cap / per-run-leak. Queries that never
OOM don't leak. The driver's shared-connection harness dies when the
accumulated leak of all 119 exceeds its budget, so the worklist is the
top of this ranking. Usage:
  python3 tools/leakprofile.py <sfDir> <verifyOutDir> [namePrefix,...]
"""
import sys, json, os, subprocess

CHILD = r'''
import sys, json, os, duckdb
sf_dir, sqlf, cap, maxit = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
sql = open(sqlf).read()
con = duckdb.connect()
con.execute(f"SET memory_limit='{cap}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
for i in range(maxit):
    try:
        con.execute(sql).fetchall()
    except duckdb.OutOfMemoryException:
        print(f"OOM {i}"); sys.exit(0)
    except Exception as e:
        print(f"ERR {type(e).__name__}"); sys.exit(0)
print(f"CLEAN {maxit}")
'''

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    cap, maxit = "400MB", 20
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    rows = []
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        import tempfile
        with tempfile.NamedTemporaryFile("w", suffix=".sql",
                                         delete=False) as f:
            f.write(sql); sqlf = f.name
        r = subprocess.run([sys.executable, "-c", CHILD, sf_dir, sqlf, cap,
                            str(maxit)], capture_output=True, text=True,
                           timeout=600)
        os.unlink(sqlf)
        out = (r.stdout.strip() or r.stderr.strip().splitlines()[-1:] or [""])
        out = out if isinstance(out, str) else (out[0] if out else "")
        rows.append((name, out))
        print(f"{out:>10}  {name}", flush=True)
    def leakiness(o):
        if o.startswith("OOM"):
            return 1000 - int(o.split()[1])
        return 0
    print(f"\n== leakers (cap={cap}, maxit={maxit}) ==")
    for name, o in sorted(rows, key=lambda kv: -leakiness(kv[1])):
        if leakiness(o) > 0:
            print(f"{o:>10}  {name}")

if __name__ == "__main__":
    main()
