#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL
in DuckDB over the sf parquet tables, compare to the Verify parquet dump
(sort columns by name, row-order-insensitive value hash)."""
import duckdb, json, sys, glob, os, hashlib

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r4"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def rep(v):
    # driver-tolerant float compare: accumulation order shifts the last
    # couple of ulps on aggregates like stddev
    if isinstance(v, float):
        return f"{v:.10g}"
    return repr(v)

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(rep(v) for v in r) for r in df.itertuples(index=False, name=None))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(rows), h, rows

fails = []
# union of oracle keys and output dirs: a query that failed at plan time
# (only an _ERROR.json sentinel, no parquet) must show up as a FAIL even
# if it has no oracle entry — never silently vanish.
out_names = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
for name in sorted(set(oracle) | out_names):
    if only and name not in only:
        continue
    sql = oracle.get(name)
    err_sentinel = f"{out_dir}/{name}/_ERROR.json"
    if os.path.exists(err_sentinel):
        msg = json.load(open(err_sentinel)).get("error", "?")
        print(f"{name}: SPARK-ERROR {msg}")
        fails.append((name, f"spark error: {msg}")); continue
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        fails.append((name, "no spark output")); continue
    if sql is None:
        print(f"{name}: no oracle (rows-only)"); continue
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet({pq!r})").df()
        ora_df = con.execute(sql).df()
        n1, h1, r1 = canon(spark_df)
        n2, h2, r2 = canon(ora_df)
        ok = (n1 == n2) and (h1 == h2)
        print(f"{name}: rows {n1}/{n2} hash {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            fails.append((name, "mismatch"))
            for a, b in list(zip(r1, r2))[:5]:
                if a != b:
                    print("  spark:", a); print("  oracle:", b)
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails.append((name, str(e)))
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
