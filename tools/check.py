#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against Verify's parquet
dumps (columns sorted by name, values hashed row-wise). Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [--shared[=LIMIT]]
--shared runs every query on ONE connection (the driver's harness
shape, where working memory accumulates) with an optional DuckDB
memory_limit (default 2GB) — the stress mode that caught the r8 OOMs.
"""
import sys, json, glob, os, tempfile
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware -> naive for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") and getattr(df[c].dt, "tz", None) is not None:
            df[c] = df[c].dt.tz_localize(None)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    shared_limit = None
    for a in sys.argv[3:]:
        if a.startswith("--shared"):
            shared_limit = a.split("=", 1)[1] if "=" in a else "2GB"
    def make_con():
        con = duckdb.connect()
        if shared_limit:
            con.execute(f"SET memory_limit='{shared_limit}'")
            # an in-memory DuckDB has NO temp directory, so a capped
            # connection cannot spill AT ALL and cumulative allocator
            # pressure across a 160-query registry OOMs the tail (seen
            # at st16-st18: queries that run in milliseconds standalone
            # failed 16KB allocations). A bounded-memory engine is
            # expected to spill; give the oracle the same right. The
            # memory_limit itself is unchanged.
            spill = os.path.join(tempfile.gettempdir(), "graft_check_spill")
            os.makedirs(spill, exist_ok=True)
            con.execute(f"SET temp_directory='{spill}'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return con
    # default: one connection per query (DuckDB working memory accumulates
    # across heavy queries on a shared connection and can OOM late queries
    # that run fine standalone); --shared: one capped connection for all,
    # the driver-harness stress shape
    shared_con = make_con() if shared_limit else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            con = shared_con or make_con()
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = norm(con.execute(sql).df())
            if not shared_con:
                con.close()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        ok_schema = list(got.columns) == list(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_vals = ok_schema and ok_rows and got.equals(exp)
        if not ok_vals and ok_schema and ok_rows:
            # report first differing cell for debugging
            for c in got.columns:
                if not got[c].equals(exp[c]):
                    neq = (got[c] != exp[c]) & ~(got[c].isna() & exp[c].isna())
                    i = neq.idxmax()
                    print(f"  diff {name}.{c}[{i}]: spark={got[c][i]!r} duckdb={exp[c][i]!r}")
                    break
        status = "PASS" if ok_vals else "FAIL"
        if ok_vals: n_pass += 1
        else: n_fail += 1
        print(f"{status} {name}: schema={ok_schema} rows={len(got)}/{len(exp)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
