#!/usr/bin/env python3
"""Rank oracle SQLs by DuckDB peak memory: for each query, find the
smallest memory_limit tier under which it completes on a fresh
connection. The driver's shared-connection harness OOMs when per-query
peaks are high, so this is the slimming worklist. Usage:
  python3 tools/memprofile.py <sfDir> <verifyOutDir> [namePrefix,...]
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

TIERS = ["64MB", "128MB", "256MB", "512MB", "1GB", "2GB", "4GB", "8GB"]

def run_at(sf_dir, sql, limit):
    con = duckdb.connect()
    try:
        con.execute(f"SET memory_limit='{limit}'")
        con.execute("SET threads=8")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        con.execute(sql).fetchall()
        return True, None
    except duckdb.OutOfMemoryException:
        return False, "OOM"
    except Exception as e:
        return False, f"{type(e).__name__}: {e}"
    finally:
        con.close()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        tier = None
        for t in TIERS:
            ok, err = run_at(sf_dir, sql, t)
            if ok:
                tier = t
                break
            if err != "OOM":
                tier = f"ERR {err}"
                break
        results[name] = tier or f">{TIERS[-1]}"
        print(f"{results[name]:>10}  {name}", flush=True)
    order = {t: i for i, t in enumerate(TIERS)}
    worst = sorted(results.items(),
                   key=lambda kv: -order.get(kv[1], len(TIERS)))
    print("\n== worst 15 ==")
    for name, tier in worst[:15]:
        print(f"{tier:>10}  {name}")

if __name__ == "__main__":
    main()
